"""TPU probe: sampler block stage breakdown + 1M-node scale check."""
import os
import sys
import time

import numpy as np

t00 = time.time()
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax_bench_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def log(m):
    print(f"[{time.time()-t00:6.1f}s] {m}", flush=True)


sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from surel_plus_tpu.graph.synthetic import rmat_graph
from surel_plus_tpu.ops import walk as W
from surel_plus_tpu.ops.sampler import (
    device_graph, sample_gsets_device_keys, shuffled_indices_for)

M, S, BUCKET = 100, 3, 301
g = rmat_graph(250_000, 2_500_000, seed=0)
indptr, indices = device_graph(g)
shuffled = shuffled_indices_for(g, 0)
seeds = jnp.asarray(np.arange(65536, dtype=np.int32))
key = jax.random.PRNGKey(0)

walk_j = jax.jit(W._walk_block, static_argnums=(4, 5))
sets_j = jax.jit(W._build_sets_packed_block, static_argnums=(2, 3, 4))


def timed(label, fn, *args, reps=8):
    out = fn(*args)
    _ = float(jnp.asarray(out[0] if isinstance(out, tuple) else out
                          ).ravel()[0].astype(jnp.float32))
    t0 = time.time()
    for _i in range(reps):
        out = fn(*args)
    _ = float(jnp.asarray(out[0] if isinstance(out, tuple) else out
                          ).ravel()[0].astype(jnp.float32))
    dt = (time.time() - t0) / reps
    log(f"{label}: {dt*1000:.0f}ms")
    return out


walks = timed("walks [65536,100,3]", walk_j, indptr, indices, shuffled,
              seeds, M, S, key)
timed("sets+pack", sets_j, seeds, walks, M, S, BUCKET)
timed("fused block", lambda: W.sample_block(
    indptr, indices, shuffled, seeds, key, num_walks=M, num_steps=S,
    bucket=BUCKET))

# 1M-node scale check
g2 = rmat_graph(1_000_000, 10_000_000, seed=1)
t0 = time.time()
spgk = sample_gsets_device_keys(g2, np.arange(1_000_000, dtype=np.int32),
                                num_walks=M, num_steps=S, seed=0)
_ = int(spgk.sizes.max())
dt = time.time() - t0
log(f"1M nodes sampled (incl any compile): {dt:.1f}s -> "
    f"{1_000_000/dt:,.0f} sets/s")
t0 = time.time()
spgk = sample_gsets_device_keys(g2, np.arange(1_000_000, dtype=np.int32),
                                num_walks=M, num_steps=S, seed=1)
_ = int(spgk.sizes.max())
dt = time.time() - t0
log(f"1M nodes warm: {dt:.1f}s -> {1_000_000/dt:,.0f} sets/s")
