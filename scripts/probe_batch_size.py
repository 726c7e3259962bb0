"""Does the headline mean-aggregator train rate scale with batch size?
bench.py uses bs=4096 (the r1 choice); if per-step fixed costs matter,
larger tiles buy throughput for free.

python scripts/probe_batch_size.py [bs ...]   # default: 4096 8192 16384
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax_bench_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp  # noqa: E402

from surel_plus_tpu.graph.synthetic import rmat_graph  # noqa: E402
from surel_plus_tpu.models import Net  # noqa: E402
from surel_plus_tpu.ops.sampler import sample_gsets_device_keys  # noqa
from surel_plus_tpu.train import TrainConfig  # noqa: E402
from surel_plus_tpu.train.device import trainer_from_keys  # noqa: E402


def main():
    sizes = [int(a) for a in sys.argv[1:]] or [4096, 8192, 16384]
    num_nodes, num_edges = 250_000, 2_500_000
    M, S = 100, 3
    epoch_edges, n_epochs = 32 * 4096, 4

    g = rmat_graph(num_nodes, num_edges, seed=0)
    seeds = np.arange(num_nodes, dtype=np.int32)
    spgk = sample_gsets_device_keys(g, seeds, num_walks=M, num_steps=S,
                                    seed=0)
    _ = int(spgk.sizes.max())
    print(f"sampled; device={jax.devices()[0].device_kind}", flush=True)

    rng = np.random.default_rng(0)
    edges = rng.integers(0, num_nodes,
                         size=(2, epoch_edges)).astype(np.int32)
    labels = (rng.random(epoch_edges) < 0.5).astype(np.float32)
    ed, ld = jnp.asarray(edges), jnp.asarray(labels)

    for bs in sizes:
        cfg = TrainConfig(batch_size=bs, lr=1e-3)
        model = Net(input_dim=S + 1, hidden_dim=96, aggrs="mean",
                    dropout=0.1, dtype="bfloat16")
        tr = trainer_from_keys(model, spgk, cfg)
        params, opt_state = tr.init(jax.random.PRNGKey(0),
                                    edges[:, :bs])
        p, o, losses, _ = tr.fit(params, opt_state, ed, ld,
                                 jax.random.PRNGKey(1), n_epochs)
        _ = float(losses[-1])
        t0 = time.time()
        p, o, losses, _ = tr.fit(p, o, ed, ld, jax.random.PRNGKey(2),
                                 n_epochs)
        _ = float(losses[-1])
        dt = time.time() - t0
        print(f"bs={bs}: {n_epochs * epoch_edges / dt:,.0f} q/s "
              f"({dt / (n_epochs * epoch_edges / bs) * 1e3:.2f} ms/step)",
              flush=True)


if __name__ == "__main__":
    main()
