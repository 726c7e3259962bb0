import time

from surel_plus_tpu.utils.profiling import Metrics, jax_trace


def test_metrics_phases():
    m = Metrics()
    with m.phase("sample", items=100):
        time.sleep(0.01)
    with m.phase("sample", items=50):
        pass
    with m.phase("join"):
        pass
    rep = m.report()
    assert rep["sample"].count == 2
    assert rep["sample"].items == 150
    assert rep["sample"].total_s >= 0.01
    assert rep["sample"].items_per_s > 0
    assert rep["join"].items_per_s == 0.0
    m.log_report()
    m.reset()
    assert not m.report()


def test_jax_trace_noop():
    with jax_trace(None):
        pass  # no-op path


def test_stream_to_logger(tmp_path):
    import logging

    from surel_plus_tpu.utils.logger import _StreamToLogger

    logger = logging.getLogger("cap_test")
    records = []
    handler = logging.Handler()
    handler.emit = lambda r: records.append(r.getMessage())
    logger.addHandler(handler)
    logger.setLevel(logging.DEBUG)
    s = _StreamToLogger(logger)
    s.write("hello\nwor")
    s.write("ld\n")
    s.flush()
    assert records == ["hello", "world"]
