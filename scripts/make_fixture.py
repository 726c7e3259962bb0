"""Generate the recorded-split offline fixture (see BLOCKED_OGB.md).

A collab-shaped weighted graph in the exact RawLinkData/OGB split layout:
power-law (RMAT) degree structure, collaboration-count edge weights,
held-out valid/test positives with recorded evaluation negatives.
Deterministic: same seed -> same npz, committed at
surel_plus_tpu/data/fixtures/collab_fixture.npz.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from surel_plus_tpu.graph.negative import negative_sampling  # noqa: E402
from surel_plus_tpu.graph.synthetic import rmat_graph  # noqa: E402

SEED = 20260817
N_NODES = 30_000
N_EDGES = 360_000          # RMAT draws; ~uniques after dedup
VAL_FRAC, TEST_FRAC = 0.04, 0.04
NEG_PER_SPLIT = 30_000


def main():
    rng = np.random.default_rng(SEED)
    g = rmat_graph(N_NODES, N_EDGES, seed=SEED)
    sp = g.to_scipy().tocoo()
    keep = sp.row < sp.col
    edges = np.stack([sp.row[keep], sp.col[keep]]).astype(np.int64)
    E = edges.shape[1]
    # collaboration-count weights (collab's edge_weight analog)
    weights = (1 + rng.poisson(0.7, size=E)).astype(np.float32)

    perm = rng.permutation(E)
    n_val, n_test = int(E * VAL_FRAC), int(E * TEST_FRAC)
    test_i = perm[:n_test]
    val_i = perm[n_test:n_test + n_val]
    train_i = perm[n_test + n_val:]

    neg_val = negative_sampling(edges, N_NODES, NEG_PER_SPLIT, rng=rng).T
    neg_test = negative_sampling(edges, N_NODES, NEG_PER_SPLIT, rng=rng).T

    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "surel_plus_tpu", "data", "fixtures")
    os.makedirs(out, exist_ok=True)
    path = os.path.join(out, "collab_fixture.npz")
    np.savez_compressed(
        path,
        num_nodes=np.int64(N_NODES),
        train_edge=edges[:, train_i].T.astype(np.int32),
        train_weight=weights[train_i],
        valid_edge=edges[:, val_i].T.astype(np.int32),
        valid_weight=weights[val_i],
        valid_neg=neg_val.astype(np.int32),
        test_edge=edges[:, test_i].T.astype(np.int32),
        test_weight=weights[test_i],
        test_neg=neg_test.astype(np.int32),
    )
    print(f"wrote {path}: N={N_NODES} train={len(train_i)} "
          f"val={n_val} test={n_test} "
          f"({os.path.getsize(path)/1e6:.1f} MB)")


if __name__ == "__main__":
    main()
