"""Tracing and metrics: first-class per-phase observability.

The reference has only printf wall-clocks inside the C sampler
(subg_acc.c:878,1009) and ad-hoc `time.time()` spans (main.py:167,197).
Here: a structured phase-timer registry every subsystem reports into, plus
an optional JAX profiler trace capture for XLA-level analysis.
"""

from __future__ import annotations

import contextlib
import dataclasses
import logging
import time
from collections import defaultdict
from typing import Dict, Iterator, Optional

log = logging.getLogger(__name__)


@dataclasses.dataclass
class PhaseStat:
    total_s: float = 0.0
    count: int = 0
    items: int = 0

    @property
    def mean_s(self) -> float:
        return self.total_s / max(self.count, 1)

    @property
    def items_per_s(self) -> float:
        return self.items / self.total_s if self.total_s > 0 else 0.0


class Metrics:
    """Process-wide phase timing registry.

    with metrics.phase("sampling", items=num_seeds):
        ...
    metrics.report()  # -> {"sampling": PhaseStat(...), ...}
    """

    def __init__(self):
        self._stats: Dict[str, PhaseStat] = defaultdict(PhaseStat)

    @contextlib.contextmanager
    def phase(self, name: str, items: int = 0) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            s = self._stats[name]
            s.total_s += dt
            s.count += 1
            s.items += items

    def add(self, name: str, seconds: float, items: int = 0) -> None:
        """Record an externally-timed span under `name`."""
        s = self._stats[name]
        s.total_s += seconds
        s.count += 1
        s.items += items

    def report(self) -> Dict[str, PhaseStat]:
        return dict(self._stats)

    def log_report(self, logger=None):
        lg = logger or log
        for name, s in sorted(self._stats.items()):
            msg = (f"phase {name}: {s.total_s:.3f}s over {s.count} calls"
                   + (f", {s.items_per_s:,.0f} items/s" if s.items else ""))
            lg.info(msg)

    def reset(self):
        self._stats.clear()


metrics = Metrics()


@contextlib.contextmanager
def jax_trace(log_dir: Optional[str]) -> Iterator[None]:
    """Capture an XLA profiler trace (view with TensorBoard / xprof).
    No-op when log_dir is None."""
    if not log_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
