"""TPU A/B: Pallas fused hidden-sum kernel vs the XLA aggregate path.

Times 64-step scans of the full train step (keys join + Net mean/direct +
adam) with Net.fused_hidden False / True. Also times inference forward.
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
from surel_plus_tpu.ops.sampler import sample_gsets_device_keys
from surel_plus_tpu.train import TrainConfig
from surel_plus_tpu.train.device import trainer_from_keys

N, bs, STEPS = 100_000, 4096, 64
g = rmat_graph(N, 10 * N, seed=0)
spgk = sample_gsets_device_keys(g, np.arange(N, dtype=np.int32),
                                num_walks=100, num_steps=3, seed=0)
_ = int(spgk.sizes.max())
log("sampled")

rng = np.random.default_rng(0)
edges = jnp.asarray(rng.integers(0, N, size=(2, bs * 8)).astype(np.int32))
labels = jnp.asarray((rng.random(bs * 8) < 0.5).astype(np.float32))
join = make_keys_join(100, 3)

optimizer = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(1e-3))


def bench_variant(tag, fused):
    model = Net(input_dim=4, hidden_dim=96, aggrs="mean", dropout=0.1,
                dtype="bfloat16", embed_mode="direct", fused_hidden=fused)
    cfg = TrainConfig(batch_size=bs, lr=1e-3)
    tr = trainer_from_keys(model, spgk, cfg)
    params, opt_state = tr.init(jax.random.PRNGKey(0),
                                np.asarray(edges[:, :bs]))

    def loss_of(p, be, bl):
        joined = join(spgk.nodes, spgk.khi, spgk.klo, spgk.sizes, be)
        logits = tr.train_model.apply(
            p, jnp.zeros((1, 1)), joined, None, train=True,
            rngs={"dropout": jax.random.PRNGKey(0)})
        return optax.sigmoid_binary_cross_entropy(logits, bl).mean()

    @jax.jit
    def full_step(params, opt_state, edges, labels):
        def step(carry, i):
            params, opt_state = carry
            be = jax.lax.dynamic_slice_in_dim(edges, (i % 8) * bs, bs,
                                              axis=1)
            bl = jax.lax.dynamic_slice_in_dim(labels, (i % 8) * bs, bs)
            loss, grads = jax.value_and_grad(loss_of)(params, be, bl)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), loss

        (params, opt_state), losses = jax.lax.scan(
            step, (params, opt_state), jnp.arange(STEPS, dtype=jnp.int32))
        return losses.sum()

    @jax.jit
    def fwd_only(params, edges, labels):
        def step(acc, i):
            be = jax.lax.dynamic_slice_in_dim(edges, (i % 8) * bs, bs,
                                              axis=1)
            bl = jax.lax.dynamic_slice_in_dim(labels, (i % 8) * bs, bs)
            joined = join(spgk.nodes, spgk.khi, spgk.klo, spgk.sizes, be)
            logits = tr.train_model.apply(params, jnp.zeros((1, 1)),
                                          joined, None, train=False)
            return acc + logits.sum(), None

        acc, _ = jax.lax.scan(step, jnp.float32(0),
                              jnp.arange(STEPS, dtype=jnp.int32))
        return acc

    for label, fn, args in ((f"{tag} train", full_step,
                             (params, opt_state, edges, labels)),
                            (f"{tag} fwd", fwd_only,
                             (params, edges, labels))):
        t0 = time.time()
        out = fn(*args)
        _ = float(out)
        log(f"{label} cold {time.time()-t0:.1f}s")
        t0 = time.time()
        out = fn(*args)
        _ = float(out)
        dt = time.time() - t0
        qps = STEPS * bs / dt
        log(f"{label} warm {dt:.2f}s -> {dt/STEPS*1000:.2f}ms/step "
            f"= {qps/1000:.1f}k q/s")


bench_variant("xla", False)
bench_variant("fused", True)
