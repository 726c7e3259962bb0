"""Roofline probe (VERDICT r3 item 6): measure the achievable floors of
each train-step part so the step decomposition (probe_join_parts) can be
adjudicated closed-vs-headroom.

Measured on HW:
  a) HBM stream rate: y = x + 1 over a ~256 MB f32 array (read+write).
  b) lax.sort pass-rate: warm time of a 2-operand row sort at
     [4096, W] for W in (128, 256, 602, 1024); the bitonic SORT network
     is ~log2(Wp)*(log2(Wp)+1)/2 compare-exchange passes over both
     operands, so time/passes gives the per-pass traffic rate, and a
     log2(Wp)-pass MERGE floor follows.
  c) row-gather rate: rows[idx] for a [20k, 301] uint32 plane at 8192
     and 65536 indices (the join's SpG row gathers).

All timings end with a scalar pull (tunnel rule, CLAUDE.md).

python scripts/probe_roofline.py
"""
import math
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

t00 = time.time()
ITERS = 32


def log(m):
    print(f"[{time.time()-t00:6.1f}s] {m}", flush=True)


def timeit(label, fn, *args):
    """Warm once, then time ITERS repeats in one jit via fori_loop to
    amortize the ~1 s dispatch roundtrip. Operands are jit ARGUMENTS
    (closure-captured device arrays become embedded constants and blow
    the remote-compile payload, CLAUDE.md)."""
    f = jax.jit(lambda *a: jax.lax.fori_loop(
        0, ITERS, lambda i, c: fn(*a, c), jnp.float32(0.0)))
    out = f(*args)
    _ = float(out)  # compile + sync
    t0 = time.time()
    out = f(*args)
    _ = float(out)
    dt = (time.time() - t0) / ITERS
    log(f"{label}: {dt*1e3:.3f} ms/iter")
    return dt


def main():
    log(f"device={jax.devices()[0].device_kind}")
    rng = np.random.default_rng(0)

    # a) HBM stream rate
    big = jnp.asarray(rng.standard_normal(64 << 20).astype(np.float32))
    bytes_rw = big.size * 4 * 2

    def stream(x, c):
        return c + (x + 1.0).ravel()[0]

    dt = timeit("stream 256MB (r+w)", stream, big)
    log(f"  -> HBM rate {bytes_rw/dt/1e9:.0f} GB/s")

    # b) sort pass rate: key + 1 payload operand (the join's 2-op sort)
    B = 4096
    for W in (128, 256, 602, 1024):
        keys = jnp.asarray(
            rng.integers(0, 1 << 31, (B, W)).astype(np.uint32))
        pay = jnp.asarray(
            rng.integers(0, 1 << 31, (B, W)).astype(np.uint32))

        def dosort(k, p, c):
            sk, sp = jax.lax.sort((k, p), num_keys=1)
            return c + sk[0, 0].astype(jnp.float32)

        dt = timeit(f"2-op row sort [{B}, {W}]", dosort, keys, pay)
        wp = 1 << math.ceil(math.log2(W))
        passes = math.log2(wp) * (math.log2(wp) + 1) / 2
        # per pass: 2 uint32 operands read+written
        traffic = B * wp * (4 + 4) * 2 * passes
        log(f"  -> padded {wp}: ~{passes:.0f} passes, eff traffic rate "
            f"{traffic/dt/1e12:.2f} TB/s; merge floor "
            f"({math.log2(wp):.0f} passes) ~ "
            f"{dt*math.log2(wp)/passes*1e3:.2f} ms")

    # c) SpG row gathers (three planes: nodes/khi/klo)
    table = jnp.asarray(
        rng.integers(0, 1 << 31, (20_000, 301)).astype(np.uint32))
    for nidx in (8192, 65536):
        idx = jnp.asarray(
            rng.integers(0, 20_000, nidx).astype(np.int32))

        def dogather(t, i, c):
            return c + t[i][0, 0].astype(jnp.float32)

        dt = timeit(f"row gather [{nidx}] of [20k, 301]", dogather,
                    table, idx)
        by = nidx * 301 * 4 * 2
        log(f"  -> {nidx/dt/1e6:.1f}M rows/s, {by/dt/1e9:.0f} GB/s")


if __name__ == "__main__":
    main()
