"""Wide-forward-tile LSTM sweep (roofline weak-#2 follow-up): the
recurrence is a 301-step dependent chain of small matmuls, measured
0.82 us per tile-step at tb=128 — latency-bound, so wider row tiles
amortize the dependent-issue latency over more rows. Times
lstm_from_keys fwd and fwd+bwd at tb in {128, 256, 512} (tb_bwd capped
by the backward's chunk-scratch VMEM model) on the bench shape
[2, 4096, 301].

python scripts/probe_lstm_tb2.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax_bench_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp  # noqa: E402

from surel_plus_tpu.ops.pallas.lstm_kernel import lstm_from_keys  # noqa

t00 = time.time()
ITERS = 8


def log(m):
    print(f"[{time.time()-t00:6.1f}s] {m}", flush=True)


def main():
    log(f"device={jax.devices()[0].device_kind}")
    rng = np.random.default_rng(0)
    q, b, ell = 2, 4096, 301
    M, S = 100, 3
    shift = M.bit_length()
    h = 96
    kown = jnp.asarray(rng.integers(
        0, 1 << min(31, shift * S), (q, b, ell)).astype(np.uint32))
    kc = jnp.asarray(rng.integers(
        0, 1 << min(31, shift * S), (q, b, ell)).astype(np.uint32))
    sizes = rng.integers(1, ell + 1, (q, b))
    mask = jnp.asarray(np.arange(ell)[None, None, :] < sizes[:, :, None])
    u_ext = jnp.asarray(rng.standard_normal((S + 2, h)).astype(np.float32))
    wi = jnp.asarray(
        rng.standard_normal((h, 4 * h)).astype(np.float32) * 0.2)
    wh = jnp.asarray(
        rng.standard_normal((h, 4 * h)).astype(np.float32) * 0.2)
    bh = jnp.asarray(
        rng.standard_normal((4 * h,)).astype(np.float32) * 0.1)

    def bench(tag, fn, *args):
        f = jax.jit(lambda *a: jax.lax.fori_loop(
            0, ITERS, lambda i, c: fn(*a, i, c), jnp.float32(0.0)))
        t0 = time.time()
        _ = float(f(*args))
        log(f"{tag}: cold {time.time()-t0:.1f}s")
        t0 = time.time()
        _ = float(f(*args))
        dt = (time.time() - t0) / ITERS
        log(f"{tag}: {dt*1e3:.2f} ms/iter")
        return dt

    for tb, tbb in ((128, 128), (256, 128), (256, 256), (512, 128),
                    (512, 256)):
        def fwd(ko_, kc_, u_, i, c, tb=tb):
            kk = ko_ ^ (i % 2).astype(jnp.uint32)
            out = lstm_from_keys(kk, kc_, mask, u_, wi, wh, bh, shift,
                                 tb=tb)
            return c + out.sum()

        def fb(ko_, kc_, u_, i, c, tb=tb, tbb=tbb):
            kk = ko_ ^ (i % 2).astype(jnp.uint32)

            def f(uu, wi_, wh_, bh_):
                return lstm_from_keys(kk, kc_, mask, uu, wi_, wh_, bh_,
                                      shift, tb=tb, tb_bwd=tbb).sum()
            val, gr = jax.value_and_grad(f, argnums=(0, 1, 2, 3))(
                u_ext, wi, wh, bh)
            return c + val + gr[0][0, 0]

        if tbb == 128:
            bench(f"fwd tb={tb}", fwd, kown, kc, u_ext)
        bench(f"fwd+bwd tb={tb} tb_bwd={tbb}", fb, kown, kc, u_ext)


if __name__ == "__main__":
    main()
