"""Narrow the poison: same scan, no dropout / eval mode / no model."""
import os, time, sys
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_bench_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import optax
from surel_plus_tpu.graph.synthetic import rmat_graph
from surel_plus_tpu.models import Net
from surel_plus_tpu.ops.join import make_keys_join
from surel_plus_tpu.ops.sampler import sample_gsets_device_keys

N, bs, STEPS = 100_000, 4096, 64
g = rmat_graph(N, 10 * N, seed=0)
spgk = sample_gsets_device_keys(g, np.arange(N, dtype=np.int32),
                                num_walks=100, num_steps=3, seed=0)
_ = int(spgk.sizes.max())
print("sampled", flush=True)
rng = np.random.default_rng(0)
edges8 = jnp.asarray(rng.integers(0, N, size=(2, bs * 8)).astype(np.int32))
labels8 = jnp.asarray((rng.random(bs * 8) < 0.5).astype(np.float32))
join = make_keys_join(100, 3)

model = Net(input_dim=4, hidden_dim=96, aggrs="mean", dropout=0.0,
            dtype="float32", fused_hidden=False, key_layout=(100, 3))
jb0 = jax.jit(lambda e: join(spgk.nodes, spgk.khi, spgk.klo,
                             spgk.sizes, e))(edges8[:, :bs])
params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 1), jnp.float32),
                    jb0)

def make_scan(apply_fn):
    @jax.jit
    def scan_fb(params, edges, labels):
        def loss(p, e, y):
            jb = join(spgk.nodes, spgk.khi, spgk.klo, spgk.sizes, e)
            return apply_fn(p, jb, y)
        def body(acc, i):
            e = jax.lax.dynamic_slice_in_dim(edges, (i % 8) * bs, bs, axis=1)
            y = jax.lax.dynamic_slice_in_dim(labels, (i % 8) * bs, bs)
            l, gr = jax.value_and_grad(loss)(params, e, y)
            return acc + l + sum(x.sum() for x in jax.tree.leaves(gr)), None
        acc, _ = jax.lax.scan(body, jnp.float32(0),
                              jnp.arange(STEPS, dtype=jnp.int32))
        return acc
    return scan_fb

def trial(tag, apply_fn):
    fn = make_scan(apply_fn)
    try:
        t0 = time.time(); v = float(fn(params, edges8, labels8))
        print(f"{tag}: cold ok {time.time()-t0:.1f}s", flush=True)
        t0 = time.time(); v = float(fn(params, edges8, labels8))
        print(f"{tag}: warm ok {time.time()-t0:.2f}s", flush=True)
    except Exception as ex:
        print(f"{tag}: FAILED {str(ex)[:100]}", flush=True)

# (a) raw feats consume (known good shape)
w = jnp.asarray(rng.normal(size=(4,)).astype(np.float32))
trial("feats-only", lambda p, jb, y: (jb.eidx @ w).mean())
# (b) model eval mode (no dropout)
trial("model-eval", lambda p, jb, y: optax.sigmoid_binary_cross_entropy(
    model.apply(p, jnp.zeros((1, 1)), jb, None, train=False), y).mean())
