"""Per-stage TPU timing probe for the sampler pipeline (dev tool)."""
import time
import sys
import os

import numpy as np

t00 = time.time()
import jax
import jax.numpy as jnp

jax.config.update("jax_log_compiles", True)


def log(m):
    print(f"[{time.time()-t00:6.1f}s] {m}", flush=True)


log(f"devices={jax.devices()}")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from surel_plus_tpu.graph.synthetic import rmat_graph
from surel_plus_tpu.ops import walk as W

g = rmat_graph(50_000, 500_000, seed=0)
log(f"graph N={g.num_nodes} E={g.num_edges}")
indptr, indices = g.device()
jax.block_until_ready(indices)
log("device_put done")
row_ids = jnp.asarray(np.repeat(np.arange(g.num_nodes, dtype=np.int32),
                                g.degrees().astype(np.int64)))
key = jax.random.PRNGKey(0)
t0 = time.time()
shuf = W.shuffle_csr_rows(row_ids, indices, key)
jax.block_until_ready(shuf)
log(f"shuffle done {time.time()-t0:.1f}s")
seeds = jnp.asarray((np.arange(65536, dtype=np.int32)) % g.num_nodes)
wb = jax.jit(W._walk_block, static_argnums=(4, 5))
t0 = time.time()
walks = wb(indptr, indices, shuf, seeds, 100, 3, jax.random.fold_in(key, 1))
jax.block_until_ready(walks)
log(f"walks cold {time.time()-t0:.1f}s shape={walks.shape}")
t0 = time.time()
walks2 = wb(indptr, indices, shuf, seeds, 100, 3, jax.random.fold_in(key, 2))
jax.block_until_ready(walks2)
log(f"walks warm {time.time()-t0:.2f}s")
bs = jax.jit(W._build_sets_block, static_argnums=(2, 3, 4))
t0 = time.time()
nodes, counts, sizes = bs(seeds, walks, 100, 3, 301)
jax.block_until_ready(nodes)
log(f"sets cold {time.time()-t0:.1f}s")
t0 = time.time()
nodes2, counts2, sizes2 = bs(seeds, walks2, 100, 3, 301)
jax.block_until_ready(nodes2)
log(f"sets warm {time.time()-t0:.2f}s")
pb = jax.jit(W._pack_block, static_argnums=(3, 4))
t0 = time.time()
hi, lo = pb(counts, nodes, seeds, 100, 3)
jax.block_until_ready(hi)
log(f"pack cold {time.time()-t0:.1f}s")
t0 = time.time()
out = W.sample_block(indptr, indices, shuf, seeds, jax.random.fold_in(key, 3),
                     num_walks=100, num_steps=3, bucket=301)
jax.block_until_ready(out[0])
log(f"fused sample_block cold {time.time()-t0:.1f}s")
t0 = time.time()
out = W.sample_block(indptr, indices, shuf, seeds, jax.random.fold_in(key, 4),
                     num_walks=100, num_steps=3, bucket=301)
jax.block_until_ready(out[0])
dt = time.time() - t0
log(f"fused sample_block warm {dt:.2f}s -> {65536/dt:,.0f} sets/s")
