import os, sys, time
import numpy as np
t00 = time.time()
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_bench_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
def log(m): print(f"[{time.time()-t00:6.1f}s] {m}", flush=True)
sys.path.insert(0, "/root/repo")
from surel_plus_tpu.graph.synthetic import rmat_graph
from surel_plus_tpu.models import Net
from surel_plus_tpu.ops.sampler import sample_gsets_device_keys
from surel_plus_tpu.train import TrainConfig
from surel_plus_tpu.train.device import trainer_from_keys
N = 1_000_000
g = rmat_graph(N, 10*N, seed=0)
spgk = sample_gsets_device_keys(g, np.arange(N, dtype=np.int32), num_walks=100, num_steps=3, seed=0)
_ = int(spgk.sizes.max()); log("sampled")
bs = 4096; EE = 32*bs
cfg = TrainConfig(batch_size=bs, lr=1e-3)
model = Net(input_dim=4, hidden_dim=96, aggrs="mean", dropout=0.1, dtype="bfloat16")
tr = trainer_from_keys(model, spgk, cfg, train_embed_mode="direct")  # remat
rng = np.random.default_rng(0)
edges = jnp.asarray(rng.integers(0, N, size=(2, EE)).astype(np.int32))
labels = jnp.asarray((rng.random(EE) < 0.5).astype(np.float32))
params, opt_state = tr.init(jax.random.PRNGKey(0), np.asarray(edges[:, :bs]))
params, opt_state, losses, aucs = tr.fit(params, opt_state, edges, labels, jax.random.PRNGKey(1), 2)
log(f"fit cold loss={float(losses[-1]):.4f}")
t0 = time.time()
params, opt_state, losses, aucs = tr.fit(params, opt_state, edges, labels, jax.random.PRNGKey(2), 4)
_ = float(losses[-1]); dt = time.time()-t0
log(f"remat train warm: 4x{EE} in {dt:.2f}s -> {4*EE/dt:,.0f} q/s")
