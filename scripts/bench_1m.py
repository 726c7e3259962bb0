"""Scale demonstration: 1M-node / 10M-edge graph end-to-end on one chip."""
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
from surel_plus_tpu.ops.sampler import sample_gsets_device_keys
from surel_plus_tpu.train import TrainConfig
from surel_plus_tpu.train.device import trainer_from_keys

N = 1_000_000
g = rmat_graph(N, 10 * N, seed=0)
log(f"graph N={g.num_nodes} E={g.num_edges}")

t0 = time.time()
spgk = sample_gsets_device_keys(g, np.arange(N, dtype=np.int32),
                                num_walks=100, num_steps=3, seed=0)
_ = int(spgk.sizes.max())
log(f"sample 1M (cold-ish): {time.time()-t0:.1f}s")
t0 = time.time()
spgk = sample_gsets_device_keys(g, np.arange(N, dtype=np.int32),
                                num_walks=100, num_steps=3, seed=1)
_ = int(spgk.sizes.max())
dt = time.time() - t0
log(f"sample 1M warm: {dt:.1f}s -> {N/dt:,.0f} sets/s")

bs = 4096
EE = 32 * bs
cfg = TrainConfig(batch_size=bs, lr=1e-3)
model = Net(input_dim=4, hidden_dim=96, aggrs="mean", dropout=0.1,
            dtype="bfloat16")
tr = trainer_from_keys(model, spgk, cfg)
rng = np.random.default_rng(0)
edges = jnp.asarray(rng.integers(0, N, size=(2, EE)).astype(np.int32))
labels = jnp.asarray((rng.random(EE) < 0.5).astype(np.float32))
params, opt_state = tr.init(jax.random.PRNGKey(0),
                            np.asarray(edges[:, :bs]))
key = jax.random.PRNGKey(1)
params, opt_state, losses, aucs = tr.fit(params, opt_state, edges, labels,
                                         key, 2)
log(f"fit cold: loss={float(losses[-1]):.4f} ({time.time()-t00:.1f}s in)")
t0 = time.time()
params, opt_state, losses, aucs = tr.fit(params, opt_state, edges, labels,
                                         jax.random.PRNGKey(2), 4)
_ = float(losses[-1])
dt = time.time() - t0
log(f"train warm: 4x{EE} queries in {dt:.2f}s -> {4*EE/dt:,.0f} q/s")
