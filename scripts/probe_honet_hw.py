"""HONet q=4 hyperedge hardware probe: fused (slot-split set-sum) vs
XLA template — numerics parity AND throughput A/B ON REAL TPU at the
tags-math-class shape (M=200, S'=3: the config where the monolithic
kernel's four groups measured 18.04 MB > 16 MB scoped VMEM and r3 fell
back to XLA; VERDICT r3 item 4).

env M/S override the walk shape. Reference config being covered:
/root/reference/main_horder.py:24-141 + paper Table 8 (tags-math
S=4 M=200).

python scripts/probe_honet_hw.py
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
from surel_plus_tpu.models import HONet  # noqa: E402
from surel_plus_tpu.ops.join import make_keys_hjoin  # noqa: E402
from surel_plus_tpu.ops.sampler import sample_gsets_device_keys  # noqa
from surel_plus_tpu.train import TrainConfig  # noqa: E402
from surel_plus_tpu.train.device import trainer_from_keys  # noqa: E402


def main():
    num_nodes = 50_000
    M = int(os.environ.get("M", "200"))
    S = int(os.environ.get("S", "4"))
    bs = int(os.environ.get("BS", "2048"))
    epoch_edges, n_epochs = 8 * bs, 4

    g = rmat_graph(num_nodes, 10 * num_nodes, seed=0)
    seeds = np.arange(num_nodes, dtype=np.int32)
    spgk = sample_gsets_device_keys(g, seeds, num_walks=M, num_steps=S,
                                    seed=0)
    _ = int(spgk.sizes.max())
    print(f"sampled L={spgk.nodes.shape[1]}; "
          f"device={jax.devices()[0].device_kind}", flush=True)

    rng = np.random.default_rng(0)
    hedges = rng.integers(0, num_nodes,
                          size=(3, epoch_edges)).astype(np.int32)
    labels = (rng.random(epoch_edges) < 0.5).astype(np.float32)
    ed, ld = jnp.asarray(hedges), jnp.asarray(labels)

    stats = {}
    for fused in (True, False):
        tag = f"honet[fused={fused}]"
        model = HONet(input_dim=S, hidden_dim=96, dropout=0.0,
                      fused_hidden=fused)
        tr = trainer_from_keys(model, spgk,
                               TrainConfig(batch_size=bs, lr=1e-3),
                               join_factory=make_keys_hjoin)
        params, opt_state = tr.init(jax.random.PRNGKey(0),
                                    hedges[:, :bs])
        t0 = time.time()
        # warm the SAME n_epochs program that the timing below reuses
        # (fit caches per (num_edges, n_epochs) — warming n_epochs=1
        # would leave the timed call to compile a fresh program)
        p, o, losses, aucs = tr.fit(params, opt_state, ed, ld,
                                    jax.random.PRNGKey(1), n_epochs)
        loss0 = float(losses[0])
        print(f"{tag}: fit cold (incl compile) {time.time()-t0:.1f}s "
              f"loss={loss0:.6f}", flush=True)
        leaves = jax.tree_util.tree_leaves(p)
        pn = float(sum(jnp.sum(x.astype(jnp.float32) ** 2)
                       for x in leaves)) ** 0.5
        sc = np.asarray(tr.predict(params, hedges[:, :bs])[:8],
                        dtype=np.float32)

        t0 = time.time()
        p, o, losses, aucs = tr.fit(p, o, ed, ld,
                                    jax.random.PRNGKey(2), n_epochs)
        _ = float(losses[-1])
        dt = time.time() - t0
        qps = n_epochs * epoch_edges / dt
        print(f"{tag}: train {n_epochs}x{epoch_edges} in {dt:.2f}s -> "
              f"{qps:,.0f} q/s", flush=True)
        stats[fused] = (loss0, pn, sc, qps)

    l1, n1, s1, q1 = stats[True]
    l0, n0, s0, q0 = stats[False]
    ds = float(np.abs(s1 - s0).max())
    print(f"honet: dloss={abs(l1-l0):.2e} post-step |params| d="
          f"{abs(n1-n0):.2e} max|score diff|={ds:.2e} | "
          f"fused {q1:,.0f} vs XLA {q0:,.0f} q/s (x{q1/q0:.2f})",
          flush=True)
    # bf16-class numeric drift accumulates per optimizer step: scale
    # the post-step params tolerance by the warmed epochs
    ok = (abs(l1 - l0) < 1e-3 and abs(n1 - n0) < 1e-3 * n_epochs
          and ds < 1e-2)
    print(f"honet: {'PARITY OK' if ok else '*** MISMATCH ***'}",
          flush=True)


if __name__ == "__main__":
    main()
