import os, sys, time
import numpy as np
t00 = time.time()
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_bench_cache"))
def log(m): print(f"[{time.time()-t00:6.1f}s] {m}", flush=True)
sys.path.insert(0, "/root/repo")
import optax
from surel_plus_tpu.graph.synthetic import rmat_graph
from surel_plus_tpu.models import Net
from surel_plus_tpu.ops.sampler import sample_gsets_device_keys
from surel_plus_tpu.ops.join import make_keys_join

bs, STEPS = 4096, 32
join = make_keys_join(100, 3)
optimizer = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(1e-3))
model = Net(input_dim=4, hidden_dim=96, aggrs="mean", dropout=0.1, dtype="bfloat16")

@jax.jit
def full_steps(params, opt_state, nodes, khi, klo, sizes, edges, labels):
    def step(carry, i):
        params, opt_state = carry
        be = jax.lax.dynamic_slice_in_dim(edges, (i % 8) * bs, bs, axis=1)
        bl = jax.lax.dynamic_slice_in_dim(labels, (i % 8) * bs, bs)
        joined = join(nodes, khi, klo, sizes, be)
        def loss_fn(p):
            logits = model.apply(p, jnp.zeros((1,1)), joined, None, train=True,
                                 rngs={"dropout": jax.random.PRNGKey(0)})
            return optax.sigmoid_binary_cross_entropy(logits, bl).mean()
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return (params, opt_state), loss
    (params, opt_state), losses = jax.lax.scan(step, (params, opt_state), jnp.arange(STEPS, dtype=jnp.int32))
    return losses.sum()

for N in (250_000, 1_000_000):
    g = rmat_graph(N, 10*N, seed=0)
    spgk = sample_gsets_device_keys(g, np.arange(N, dtype=np.int32), num_walks=100, num_steps=3, seed=0)
    _ = int(spgk.sizes.max()); log(f"N={N} sampled")
    rng = np.random.default_rng(0)
    edges = jnp.asarray(rng.integers(0, N, size=(2, bs*8)).astype(np.int32))
    labels = jnp.asarray((rng.random(bs*8) < 0.5).astype(np.float32))
    joined = join(spgk.nodes, spgk.khi, spgk.klo, spgk.sizes, edges[:, :bs])
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1,1)), joined, None)
    opt_state = optimizer.init(params)
    out = full_steps(params, opt_state, spgk.nodes, spgk.khi, spgk.klo, spgk.sizes, edges, labels)
    _ = float(out)
    t0 = time.time()
    out = full_steps(params, opt_state, spgk.nodes, spgk.khi, spgk.klo, spgk.sizes, edges, labels)
    _ = float(out)
    log(f"N={N} full: {(time.time()-t0)/STEPS*1000:.1f}ms/step")
    del spgk, g
