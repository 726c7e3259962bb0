"""Decompose device sampling at the bench workload: walk scan vs
set-building (sorts + cumsums) for a 65,536-seed block, each stage as
its own jitted program timed via the two-length trick (sequential scans
inside one dispatch; host pulls cost ~0.4 s through the tunnel).

python scripts/probe_sample_parts.py
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

from surel_plus_tpu.graph.synthetic import rmat_graph  # noqa: E402
from surel_plus_tpu.ops import walk as W  # noqa: E402

N, E = 250_000, 2_500_000
M, S = 100, 3
B = 65_536
BUCKET = 1 + M * S


def timeit(fn, reps=6):
    """fn(i) -> array; runs reps dispatches, pulls one scalar each; the
    per-call time is the median of the warm samples."""
    _ = float(jnp.asarray(fn(0)).ravel()[0].astype(jnp.float32))
    ts = []
    for i in range(1, reps):
        t0 = time.time()
        _ = float(jnp.asarray(fn(i)).ravel()[0].astype(jnp.float32))
        ts.append(time.time() - t0)
    return float(np.median(ts))


def main():
    print(f"device: {jax.devices()[0].device_kind}", flush=True)
    g = rmat_graph(N, E, seed=0)
    indptr, indices = g.device()
    row_ids = jnp.asarray(np.repeat(
        np.arange(g.num_nodes, dtype=np.int32),
        g.degrees().astype(np.int64)))
    key = jax.random.PRNGKey(0)
    shuf = W.shuffle_csr_rows(row_ids, indices, key)
    etab, stab = jax.jit(W.build_walk_tables)(indptr, indices, shuf)
    _ = float(etab[0, 0])
    seeds = jnp.asarray(np.arange(B, dtype=np.int32) % N)

    walk = jax.jit(lambda k: W._walk_block_tables(
        indptr, etab, stab, seeds, M, S, k))
    walks0 = walk(jax.random.fold_in(key, 1))
    _ = int(walks0[0, 0, 0])

    dt = timeit(lambda i: walk(jax.random.fold_in(key, 100 + i)))
    print(f"walk [B={B}, M={M}, S={S}]: {dt*1e3:.1f} ms "
          f"({B/dt/1e3:.0f}k sets/s walk-only)", flush=True)

    build = jax.jit(lambda w: W._build_sets_packed_block(
        seeds, w, M, S, BUCKET, num_nodes=N))
    _ = build(walks0)

    def build_i(i):
        return build(walk(jax.random.fold_in(key, 200 + i)))[3]
    # walk+build fused dispatch minus walk-only gives the build cost
    fused = jax.jit(
        lambda k: W._build_sets_packed_block(
            seeds, W._walk_block_tables(indptr, etab, stab, seeds, M, S,
                                        k), M, S, BUCKET,
            num_nodes=N)[3])
    _ = fused(jax.random.fold_in(key, 300))
    dt_f = timeit(lambda i: fused(jax.random.fold_in(key, 300 + i)))
    print(f"walk+build: {dt_f*1e3:.1f} ms ({B/dt_f/1e3:.0f}k sets/s)",
          flush=True)
    print(f"build residual: {(dt_f-dt)*1e3:.1f} ms", flush=True)

    # stage bisection inside build: first sort, cumsum, compaction sort
    visits = 1 + M * S
    vbits = max((visits - 1).bit_length(), 1)

    def first_sort(w):
        nodes = jnp.concatenate(
            [seeds[:, None], w.reshape(B, M * S)], axis=1)
        vpos0 = jnp.arange(visits, dtype=jnp.int32)
        packed = (nodes << vbits) | vpos0[None, :]
        return jax.lax.sort(packed, dimension=1)

    fs = jax.jit(lambda k: first_sort(
        W._walk_block_tables(indptr, etab, stab, seeds, M, S, k)))
    _ = fs(jax.random.fold_in(key, 400))
    dt_fs = timeit(lambda i: fs(jax.random.fold_in(key, 400 + i)))
    print(f"walk+sort1: {dt_fs*1e3:.1f} ms -> sort1 "
          f"~{(dt_fs-dt)*1e3:.1f} ms", flush=True)

    def through_cumsum(w):
        sp = first_sort(w)
        snodes = sp >> vbits
        svpos = sp & ((1 << vbits) - 1)
        scols = jnp.where(svpos == 0, 0,
                          (svpos - 1) % S + 1).astype(jnp.int32)
        shift, starts, lead_bit = W.enc_field_layout(M, S)
        s_lo = jnp.zeros((B, visits), jnp.uint32)
        for j in range(1, S + 1):
            s_lo = jnp.where(scols == j,
                             s_lo | jnp.uint32(1 << starts[j]), s_lo)
        pre = jnp.cumsum(s_lo, axis=1, dtype=jnp.uint32)
        return snodes, pre

    tc = jax.jit(lambda k: through_cumsum(
        W._walk_block_tables(indptr, etab, stab, seeds, M, S, k))[1])
    _ = tc(jax.random.fold_in(key, 500))
    dt_tc = timeit(lambda i: tc(jax.random.fold_in(key, 500 + i)))
    print(f"walk+sort1+cumsum: {dt_tc*1e3:.1f} ms -> cumsum stage "
          f"~{(dt_tc-dt_fs)*1e3:.1f} ms", flush=True)
    print(f"compaction sort + boundary residual: "
          f"~{(dt_f-dt_tc)*1e3:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
