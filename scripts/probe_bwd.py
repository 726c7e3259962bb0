"""TPU probe: train-step backward variants (dev tool).

Variants at bs=4096 over the keys SpG:
  direct+remat (current default)
  direct no-remat
  table mode (scatter-add bwd into the tiny unique table)
"""
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
import optax

from surel_plus_tpu.graph.synthetic import rmat_graph
from surel_plus_tpu.models import Net
from surel_plus_tpu.ops.join import make_keys_join
from surel_plus_tpu.ops.sampler import (sample_gsets_device,
                                        sample_gsets_device_keys)
from surel_plus_tpu.ops.join import gather_join

N, bs, STEPS = 100_000, 4096, 32
g = rmat_graph(N, 10 * N, seed=0)
spgk = sample_gsets_device_keys(g, np.arange(N, dtype=np.int32),
                                num_walks=100, num_steps=3, seed=0)
_ = int(spgk.sizes.max())
log("keys sampled")

rng = np.random.default_rng(0)
edges = jnp.asarray(rng.integers(0, N, size=(2, bs * 8)).astype(np.int32))
labels = jnp.asarray((rng.random(bs * 8) < 0.5).astype(np.float32))
kjoin = make_keys_join(100, 3)
optimizer = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(1e-3))


def make_runner(model, join, sarr, enc_of):
    def joined_of(s, be):
        return join(s, be)

    @jax.jit
    def steps(params, opt_state, sarr, edges, labels):
        def step(carry, i):
            params, opt_state = carry
            be = jax.lax.dynamic_slice_in_dim(edges, (i % 8) * bs, bs,
                                              axis=1)
            bl = jax.lax.dynamic_slice_in_dim(labels, (i % 8) * bs, bs)
            joined = joined_of(sarr, be)

            def loss_fn(p):
                logits = model.apply(p, enc_of(sarr), joined, None,
                                     train=True,
                                     rngs={"dropout": jax.random.PRNGKey(0)})
                return optax.sigmoid_binary_cross_entropy(logits,
                                                          bl).mean()

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), loss

        (params, opt_state), losses = jax.lax.scan(
            step, (params, opt_state), jnp.arange(STEPS, dtype=jnp.int32))
        return losses.sum()

    def run(label, params, opt_state):
        t0 = time.time()
        out = steps(params, opt_state, sarr, edges, labels)
        _ = float(out)
        log(f"{label} cold {time.time()-t0:.1f}s")
        t0 = time.time()
        out = steps(params, opt_state, sarr, edges, labels)
        _ = float(out)
        dt = (time.time() - t0) / STEPS
        log(f"{label} warm {dt*1000:.1f}ms/step -> {bs/dt:,.0f} q/s")

    return run


def init_params(model, join, sarr, enc_of):
    joined = join(sarr, edges[:, :bs])
    params = model.init(jax.random.PRNGKey(0), enc_of(sarr), joined, None)
    return params, optimizer.init(params)


# keys variants
sarr_k = (spgk.nodes, spgk.khi, spgk.klo, spgk.sizes)
join_k = lambda s, e: kjoin(s[0], s[1], s[2], s[3], e)
enc_k = lambda s: jnp.zeros((1, 1), jnp.float32)

for label, mode in (("direct+remat", "direct"),
                    ("direct-noremat", "direct_noremat")):
    em = "direct" if mode == "direct" else "table"  # noremat == table cls
    model = Net(input_dim=4, hidden_dim=96, aggrs="mean", dropout=0.1,
                dtype="bfloat16",
                embed_mode="direct" if mode == "direct" else "table")
    # NOTE: for the float keys path 'table' embed_mode still applies the
    # MLP directly but WITHOUT remat (mlp_cls is plain MLP2)
    params, opt_state = init_params(model, join_k, sarr_k, enc_k)
    make_runner(model, join_k, sarr_k, enc_k)(label, params, opt_state)

# table variant over the deduped SpG
dev, u = sample_gsets_device(g, np.arange(N, dtype=np.int32),
                             num_walks=100, num_steps=3, seed=0)
_ = int(dev.sizes.max())
log(f"dedup sampled u={u}")
sarr_t = (dev.nodes, dev.eidx, dev.sizes, dev.enc)
join_t = lambda s, e: gather_join(s[0], s[1], s[2], e)
enc_t = lambda s: s[3]
model = Net(input_dim=4, hidden_dim=96, aggrs="mean", dropout=0.1,
            dtype="bfloat16", embed_mode="table")
params, opt_state = init_params(model, join_t, sarr_t, enc_t)
make_runner(model, join_t, sarr_t, enc_t)("table-embed", params, opt_state)
