"""TPU probe: sampling + epoch timing (dev tool).

Usage: python scripts/probe_train.py [direct|table] [N] [bs]
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
from surel_plus_tpu.graph.synthetic import rmat_graph
from surel_plus_tpu.models import Net
from surel_plus_tpu.ops.sampler import sample_gsets_device
from surel_plus_tpu.train import TrainConfig
from surel_plus_tpu.train.device import DeviceTrainer

mode = sys.argv[1] if len(sys.argv) > 1 else "direct"
N = int(sys.argv[2]) if len(sys.argv) > 2 else 100_000
bs = int(sys.argv[3]) if len(sys.argv) > 3 else 2048
g = rmat_graph(N, 10 * N, seed=0)
log(f"graph N={g.num_nodes} E={g.num_edges} mode={mode} bs={bs}")

t0 = time.time()
dev, u = sample_gsets_device(g, np.arange(N, dtype=np.int32),
                             num_walks=100, num_steps=3, seed=0)
jax.block_until_ready(dev.eidx)
log(f"sample cold {time.time()-t0:.1f}s u={u}")
t0 = time.time()
dev2, _ = sample_gsets_device(g, np.arange(N, dtype=np.int32),
                              num_walks=100, num_steps=3, seed=1)
jax.block_until_ready(dev2.eidx)
log(f"sample warm {time.time()-t0:.1f}s -> {N/(time.time()-t0):,.0f} sets/s")

EE = 8 * bs
cfg = TrainConfig(batch_size=bs, lr=1e-3)
rng = np.random.default_rng(0)
edges = jnp.asarray(rng.integers(0, N, size=(2, EE)).astype(np.int32))
labels = jnp.asarray((rng.random(EE) < 0.5).astype(np.float32))

model = Net(input_dim=4, hidden_dim=96, aggrs="mean", dropout=0.1)
tr = DeviceTrainer(model, dev, cfg, train_embed_mode=mode)
t0 = time.time()
params, opt_state = tr.init(jax.random.PRNGKey(0),
                            np.asarray(edges[:, :bs]))
jax.block_until_ready(params)
log(f"init {time.time()-t0:.1f}s")
key = jax.random.PRNGKey(1)
t0 = time.time()
key, sub = jax.random.split(key)
params, opt_state, loss, auc = tr.train_epoch(params, opt_state,
                                              edges, labels, sub)
jax.block_until_ready(loss)
log(f"epoch cold {time.time()-t0:.1f}s loss={float(loss):.4f}")
t0 = time.time()
for _ in range(3):
    key, sub = jax.random.split(key)
    params, opt_state, loss, auc = tr.train_epoch(params, opt_state,
                                                  edges, labels, sub)
jax.block_until_ready(loss)
dt = time.time() - t0
log(f"3 epochs warm {dt:.2f}s -> {3*EE/dt:,.0f} q/s")
