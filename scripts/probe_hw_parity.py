"""Hardware-numerics parity: fused Pallas aggregator paths vs the XLA
template paths ON REAL TPU (interpret-mode parity is necessary but not
sufficient — the bitonic-merge post-mortem proved a kernel can be
bit-exact in interpret mode yet broken on the device).

For each aggregator (mean, attn, lstm): same params, same joined batch,
compare loss and grad-norm between fused_hidden=True and =False, all on
the TPU backend.

python scripts/probe_hw_parity.py [aggrs...]
"""
import os
import sys

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


def run(aggrs: str, spgk, edges, labels, S: int) -> None:
    stats = {}
    for fused in (True, False):
        model = Net(input_dim=S + 1, hidden_dim=96, aggrs=aggrs,
                    dropout=0.0, dtype="float32", fused_hidden=fused)
        tr = trainer_from_keys(model, spgk, TrainConfig(
            batch_size=edges.shape[1], lr=1e-3))
        params, _ = tr.init(jax.random.PRNGKey(0), edges)
        # value + grad through the training step machinery: one fit epoch
        p2, o2 = tr.init(jax.random.PRNGKey(0), edges)
        p2, o2, losses, aucs = tr.fit(
            p2, o2, jnp.asarray(edges), jnp.asarray(labels),
            jax.random.PRNGKey(1), 1)
        leaves = jax.tree_util.tree_leaves(p2)
        pn = float(sum(jnp.sum(x.astype(jnp.float32) ** 2)
                       for x in leaves)) ** 0.5
        sc = tr.predict(params, edges)
        stats[fused] = (float(losses[-1]), pn,
                        np.asarray(sc[:8], dtype=np.float32))
    l1, n1, s1 = stats[True]
    l0, n0, s0 = stats[False]
    ds = float(np.abs(s1 - s0).max())
    print(f"{aggrs}: fused loss={l1:.6f} unfused loss={l0:.6f} "
          f"dloss={abs(l1-l0):.2e} | post-step |params| "
          f"{n1:.6f} vs {n0:.6f} d={abs(n1-n0):.2e} | "
          f"max|score diff|={ds:.2e}", flush=True)
    ok = abs(l1 - l0) < 1e-3 and abs(n1 - n0) < 1e-3 and ds < 1e-2
    print(f"{aggrs}: {'PARITY OK' if ok else '*** MISMATCH ***'}",
          flush=True)


def main():
    aggrs_list = sys.argv[1:] or ["mean", "attn", "lstm"]
    # env M/S override the walk shape (M=200 S=4 = ppa/tags lead-in-hi
    # layout, where the chunked attn pool + slot-split set-sum engage)
    num_nodes = 20_000
    M = int(os.environ.get("M", "100"))
    S = int(os.environ.get("S", "3"))
    g = rmat_graph(num_nodes, 200_000, seed=0)
    seeds = np.arange(num_nodes, dtype=np.int32)
    spgk = sample_gsets_device_keys(g, seeds, num_walks=M, num_steps=S,
                                    seed=0, block_size=num_nodes)
    _ = int(spgk.sizes.max())
    print(f"sampled; device={jax.devices()[0].device_kind}", flush=True)
    rng = np.random.default_rng(0)
    edges = rng.integers(0, num_nodes, size=(2, 512)).astype(np.int32)
    labels = (rng.random(512) < 0.5).astype(np.float32)
    for a in aggrs_list:
        run(a, spgk, edges, labels, S)


if __name__ == "__main__":
    main()
