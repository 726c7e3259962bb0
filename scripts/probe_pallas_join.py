import os, sys, time
import numpy as np
t00 = time.time()
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_bench_cache"))
def log(m): print(f"[{time.time()-t00:6.1f}s] {m}", flush=True)
sys.path.insert(0, "/root/repo")
from surel_plus_tpu.graph.synthetic import rmat_graph
from surel_plus_tpu.ops.sampler import sample_gsets_device_keys
from surel_plus_tpu.ops.join import make_keys_join
N, bs, STEPS = 250_000, 4096, 32
g = rmat_graph(N, 10*N, seed=0)
spgk = sample_gsets_device_keys(g, np.arange(N, dtype=np.int32), num_walks=100, num_steps=3, seed=0)
_ = int(spgk.sizes.max()); log("sampled")
rng = np.random.default_rng(0)
edges = jnp.asarray(rng.integers(0, N, size=(2, bs*8)).astype(np.int32))
for impl in ("merge", "pallas"):
    join = make_keys_join(100, 3, impl=impl)
    @jax.jit
    def join_only(nodes, khi, klo, sizes, edges):
        def step(acc, i):
            be = jax.lax.dynamic_slice_in_dim(edges, (i % 8) * bs, bs, axis=1)
            out = join(nodes, khi, klo, sizes, be)
            return acc + out.eidx.sum(), None
        acc, _ = jax.lax.scan(step, jnp.float32(0), jnp.arange(STEPS, dtype=jnp.int32))
        return acc
    try:
        t0 = time.time()
        out = join_only(spgk.nodes, spgk.khi, spgk.klo, spgk.sizes, edges)
        v1 = float(out)
        log(f"{impl} cold {time.time()-t0:.1f}s sum={v1:.1f}")
        t0 = time.time()
        out = join_only(spgk.nodes, spgk.khi, spgk.klo, spgk.sizes, edges)
        _ = float(out)
        log(f"{impl} warm {(time.time()-t0)/STEPS*1000:.1f}ms/step")
    except Exception as e:
        log(f"{impl} FAILED: {type(e).__name__}: {str(e)[:300]}")
