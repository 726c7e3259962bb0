"""Balanced-|S_Q| width-classed batching vs fixed-bucket training on a
skewed graph (TPU). The paper's §3.3 load-balance reborn as static width
classes; reference contrast: train.py:20-30's CSR Sigma-nnz packing.

python scripts/probe_balanced.py
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
    # heavily skewed RMAT: most nodes low-degree -> small sets
    num_nodes, num_edges = 250_000, 2_500_000
    M, S = 100, 3
    bs, epoch_edges, n_epochs = 4096, 16 * 4096, 4

    g = rmat_graph(num_nodes, num_edges, seed=0, a=0.65, b=0.2, c=0.1)
    seeds = np.arange(num_nodes, dtype=np.int32)
    spgk = sample_gsets_device_keys(g, seeds, num_walks=M, num_steps=S,
                                    seed=0)
    bucket = int(spgk.nodes.shape[1])
    sizes_h = np.asarray(spgk.sizes)
    print(f"bucket={bucket} set sizes: p50={np.percentile(sizes_h,50):.0f} "
          f"p90={np.percentile(sizes_h,90):.0f} max={sizes_h.max()}",
          flush=True)

    cfg = TrainConfig(batch_size=bs, lr=1e-3)
    model = Net(input_dim=S + 1, hidden_dim=96, dropout=0.1,
                dtype="bfloat16")
    tr = trainer_from_keys(model, spgk, cfg)

    rng = np.random.default_rng(0)
    edges = rng.integers(0, num_nodes,
                         size=(2, epoch_edges)).astype(np.int32)
    labels = (rng.random(epoch_edges) < 0.5).astype(np.float32)
    params, opt_state = tr.init(jax.random.PRNGKey(0), edges[:, :bs])

    ed, ld = jnp.asarray(edges), jnp.asarray(labels)

    def run_fixed():
        p, o, losses, aucs = tr.fit(params, opt_state, ed, ld,
                                    jax.random.PRNGKey(1), n_epochs)
        return float(losses[-1])

    run_fixed()  # compile
    t0 = time.time()
    run_fixed()
    dt_fixed = time.time() - t0
    qps_fixed = n_epochs * epoch_edges / dt_fixed
    print(f"fixed-{bucket}: {dt_fixed:.2f}s -> {qps_fixed:,.0f} q/s",
          flush=True)

    classes = tuple(c for c in (64, 128, 192, bucket) if c <= bucket)
    groups = tr.partition_by_width(edges, classes)
    waste_fixed = 1.0 - sizes_h[edges].max(axis=0).mean() / bucket
    eff_width = sum(L * len(sel) for L, sel in groups) / edges.shape[1]
    print(f"classes {classes}: " + ", ".join(
        f"{L}:{len(sel)}" for L, sel in groups), flush=True)
    print(f"padding waste: fixed {100*waste_fixed:.0f}% -> effective "
          f"width {eff_width:.0f}/{bucket}", flush=True)

    def run_bal():
        p, o, losses, aucs, _ = tr.fit_balanced(
            params, opt_state, edges, labels, jax.random.PRNGKey(1),
            n_epochs, classes)
        return float(losses[-1])

    run_bal()  # compile
    t0 = time.time()
    run_bal()
    dt_bal = time.time() - t0
    qps_bal = n_epochs * epoch_edges / dt_bal
    print(f"balanced: {dt_bal:.2f}s -> {qps_bal:,.0f} q/s "
          f"(x{qps_bal/qps_fixed:.2f} vs fixed)", flush=True)


if __name__ == "__main__":
    main()
