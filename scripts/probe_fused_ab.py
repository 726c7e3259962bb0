"""A/B the fused Pallas aggregator paths vs the XLA template paths ON
REAL TPU, per aggregator, at the production bench shape (250k nodes,
M=100, S'=3, bs=4096).

python scripts/probe_fused_ab.py [aggr[:fused01] ...]  # default: lstm
e.g.  python scripts/probe_fused_ab.py lstm:0 lstm:1 attn:0
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
    # spec grammar: aggr[:fused01]; env M/S override the walk shape
    # (M=200 S=4 = the ppa/tags lead-in-hi layout)
    specs = sys.argv[1:] or ["lstm:0", "lstm:1"]
    num_nodes, num_edges = 250_000, 2_500_000
    M = int(os.environ.get("M", "100"))
    S = int(os.environ.get("S", "3"))
    bs, epoch_edges, n_epochs = 4096, 16 * 4096, 4

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

    for spec in specs:
        aggrs, _, f = spec.partition(":")
        fused = None if f == "" else bool(int(f))
        tag = f"{aggrs}[fused={fused}]"
        cfg = TrainConfig(batch_size=bs, lr=1e-3)
        model = Net(input_dim=S + 1, hidden_dim=96, aggrs=aggrs,
                    dropout=0.1, dtype="bfloat16", fused_hidden=fused)
        tr = trainer_from_keys(model, spgk, cfg)
        params, opt_state = tr.init(jax.random.PRNGKey(0), edges[:, :bs])

        t0 = time.time()
        p, o, losses, aucs = tr.fit(params, opt_state, ed, ld,
                                    jax.random.PRNGKey(1), n_epochs)
        _ = float(losses[-1])
        print(f"{tag}: fit cold (incl compile) {time.time()-t0:.1f}s",
              flush=True)

        t0 = time.time()
        p, o, losses, aucs = tr.fit(params, opt_state, ed, ld,
                                    jax.random.PRNGKey(2), n_epochs)
        _ = float(losses[-1])
        dt = time.time() - t0
        print(f"{tag}: train {n_epochs}x{epoch_edges} in {dt:.2f}s -> "
              f"{n_epochs*epoch_edges/dt:,.0f} q/s", flush=True)

        scores = tr.predict(params, edges)
        _ = float(scores[0])
        t0 = time.time()
        scores = tr.predict(params, edges)
        _ = float(scores[0])
        dt_inf = time.time() - t0
        print(f"{tag}: inference {epoch_edges} in {dt_inf:.2f}s -> "
              f"{epoch_edges/dt_inf:,.0f} q/s", flush=True)


if __name__ == "__main__":
    main()
