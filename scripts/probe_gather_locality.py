"""Is the walk's random row-gather issue-rate-bound or HBM-transaction
bound? Compare [B, M, 3] row gathers from an [E, 3] table with random
vs sorted vs narrow-range indices. If sorted/narrow is much faster, a
locality transform could speed the walk; if all equal, the gather is at
its issue-rate speed of light and the walk is done.

python scripts/probe_gather_locality.py
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

E = 2_500_000
B, M = 65_536, 100


def main():
    print(f"device: {jax.devices()[0].device_kind}", flush=True)
    rng = np.random.default_rng(0)
    tab = jnp.asarray(rng.integers(0, 2**31, size=(E, 3)).astype(
        np.int32))
    idx_rand = rng.integers(0, E, size=(B, M)).astype(np.int32)
    idx_sort = np.sort(idx_rand, axis=None).reshape(B, M)
    idx_narrow = (idx_rand % 4096).astype(np.int32)
    idx_seq = (np.arange(B * M, dtype=np.int64) % E).astype(
        np.int32).reshape(B, M)

    g = jax.jit(lambda t, i: t[i].sum(dtype=jnp.int32))
    # also the 1-element variant (no row structure)
    tab1 = tab[:, 0].copy()
    g1 = jax.jit(lambda t, i: t[i].sum(dtype=jnp.int32))

    for name, idx in (("random", idx_rand), ("sorted", idx_sort),
                      ("narrow4k", idx_narrow), ("sequential", idx_seq)):
        di = jnp.asarray(idx)
        _ = int(g(tab, di))
        t0 = time.time()
        for _i in range(3):
            _ = int(g(tab, di))
        dt3 = (time.time() - t0) / 3
        _ = int(g1(tab1, di))
        t0 = time.time()
        for _i in range(3):
            _ = int(g1(tab1, di))
        dt1 = (time.time() - t0) / 3
        print(f"{name:>10}: [B,M,3] rows {dt3*1e3:7.1f} ms "
              f"({B*M*3/dt3/1e6:6.0f}M elem/s) | [B,M] single "
              f"{dt1*1e3:7.1f} ms ({B*M/dt1/1e6:6.0f}M elem/s)",
              flush=True)


if __name__ == "__main__":
    main()
