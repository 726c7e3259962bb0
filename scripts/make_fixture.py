"""Generate the recorded-split offline fixtures (see BLOCKED_OGB.md).

Collab-shaped weighted graphs in the exact RawLinkData/OGB split layout:
power-law (RMAT) degree structure, collaboration-count edge weights,
held-out valid/test positives with recorded evaluation negatives.
Deterministic: same seed -> same npz, committed under
surel_plus_tpu/data/fixtures/.

Negatives are drawn AFTER the graph and positive splits from the same
RNG stream, so raising --negs regenerates ONLY the recorded evaluation
negatives — the graph, weights, and train/valid/test positives are
byte-identical to the previous fixture (asserted in main when the old
file exists). r5 hardening (VERDICT r4 item 8): 100k negatives per
eval split, taking valid-ranking noise from ~±7 to ~±2 Hits points.
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from surel_plus_tpu.graph.negative import negative_sampling  # noqa: E402
from surel_plus_tpu.graph.synthetic import rmat_graph  # noqa: E402

SEED = 20260817

# name -> (n_nodes, n_rmat_draws, val_frac, test_frac)
SPECS = {
    "collab": (30_000, 360_000, 0.04, 0.04),
    "collabs": (8_000, 72_000, 0.05, 0.05),
}


def build(name: str, negs: int, out_dir: str, check_positives: bool = True):
    n_nodes, n_draws, val_frac, test_frac = SPECS[name]
    rng = np.random.default_rng(SEED)
    g = rmat_graph(n_nodes, n_draws, seed=SEED)
    sp = g.to_scipy().tocoo()
    keep = sp.row < sp.col
    edges = np.stack([sp.row[keep], sp.col[keep]]).astype(np.int64)
    E = edges.shape[1]
    # collaboration-count weights (collab's edge_weight analog)
    weights = (1 + rng.poisson(0.7, size=E)).astype(np.float32)

    perm = rng.permutation(E)
    n_val, n_test = int(E * val_frac), int(E * test_frac)
    test_i = perm[:n_test]
    val_i = perm[n_test:n_test + n_val]
    train_i = perm[n_test + n_val:]

    neg_val = negative_sampling(edges, n_nodes, negs, rng=rng).T
    neg_test = negative_sampling(edges, n_nodes, negs, rng=rng).T

    path = os.path.join(out_dir, f"{name}_fixture.npz")
    if check_positives and os.path.exists(path):
        old = np.load(path)
        same = (old["train_edge"].shape == (len(train_i), 2)
                and np.array_equal(old["train_edge"],
                                   edges[:, train_i].T.astype(np.int32))
                and np.array_equal(old["valid_edge"],
                                   edges[:, val_i].T.astype(np.int32))
                and np.array_equal(old["test_edge"],
                                   edges[:, test_i].T.astype(np.int32))
                and np.array_equal(old["train_weight"], weights[train_i]))
        if same:
            print(f"{name}: positives/weights match committed fixture "
                  "(negatives-only regeneration)")
        else:
            print(f"{name}: REPLACING fixture (positives differ from "
                  "committed — prior generation params not in this spec)")

    np.savez_compressed(
        path,
        num_nodes=np.int64(n_nodes),
        train_edge=edges[:, train_i].T.astype(np.int32),
        train_weight=weights[train_i],
        valid_edge=edges[:, val_i].T.astype(np.int32),
        valid_weight=weights[val_i],
        valid_neg=neg_val.astype(np.int32),
        test_edge=edges[:, test_i].T.astype(np.int32),
        test_weight=weights[test_i],
        test_neg=neg_test.astype(np.int32),
    )
    print(f"wrote {path}: N={n_nodes} train={len(train_i)} "
          f"val={n_val} test={n_test} negs={negs} "
          f"({os.path.getsize(path)/1e6:.1f} MB)")


def _rmat_pairs(num_nodes, n_draws, rng, a=0.57, b=0.19, c=0.19):
    """Directed R-MAT pairs (unique, no self loops)."""
    scale = max(1, int(np.ceil(np.log2(max(num_nodes, 2)))))
    src = np.zeros(n_draws, dtype=np.int64)
    dst = np.zeros(n_draws, dtype=np.int64)
    pa, pb, pc = a, a + b, a + b + c
    for _ in range(scale):
        r = rng.random(n_draws)
        src <<= 1
        dst <<= 1
        dst |= ((r >= pa) & (r < pb)) | (r >= pc)
        src |= (r >= pb)
    src %= num_nodes
    dst %= num_nodes
    keep = src != dst
    key = src[keep] * num_nodes + dst[keep]
    key = np.unique(key)
    key = key[rng.permutation(len(key))]
    return key // num_nodes, key % num_nodes


def build_cites(negs_per_source: int, out_dir: str):
    """citation2-shaped MRR fixture: DIRECTED power-law graph, directed
    train/valid/test splits, recorded per-source negatives [Ev, K]
    (reference train.py:245-280 inference_mrr + utils.py:78-95
    get_pos_neg_edges source_node layout)."""
    n_nodes, n_draws = 20_000, 240_000
    rng = np.random.default_rng(SEED + 1)
    src, dst = _rmat_pairs(n_nodes, n_draws, rng)
    E = len(src)
    n_val = n_test = int(E * 0.04)
    test_s, test_d = src[:n_test], dst[:n_test]
    val_s, val_d = src[n_test:n_test + n_val], dst[n_test:n_test + n_val]
    tr_s, tr_d = src[n_test + n_val:], dst[n_test + n_val:]
    val_neg = rng.integers(0, n_nodes, size=(n_val, negs_per_source))
    test_neg = rng.integers(0, n_nodes, size=(n_test, negs_per_source))
    path = os.path.join(out_dir, "cites_fixture.npz")
    np.savez_compressed(
        path,
        num_nodes=np.int64(n_nodes),
        train_src=tr_s.astype(np.int32), train_dst=tr_d.astype(np.int32),
        valid_src=val_s.astype(np.int32), valid_dst=val_d.astype(np.int32),
        valid_neg=val_neg.astype(np.int32),
        test_src=test_s.astype(np.int32), test_dst=test_d.astype(np.int32),
        test_neg=test_neg.astype(np.int32),
    )
    print(f"wrote {path}: N={n_nodes} train={len(tr_s)} val={n_val} "
          f"test={n_test} negs/src={negs_per_source} "
          f"({os.path.getsize(path)/1e6:.1f} MB)")


def build_tags(negs_per_triplet: int, out_dir: str):
    """tags-math-shaped hypergraph fixture: power-law tag popularity,
    3-node hyperedges, pairwise projection encoder graph, recorded
    random-node negatives per eval triplet (reference
    dataloader.py:241-296 DE_Hyper_Dataset + make_edge_split seed-2021
    semantics, including the randint(tuples.max()) quirk)."""
    from surel_plus_tpu.graph.datasets import DEHyperDataset

    n_nodes, n_triplets = 5_000, 40_000
    rng = np.random.default_rng(SEED + 2)
    # Zipf-ish popularity: tag frequency ~ rank^-0.9 like SO tags
    pop = (np.arange(1, n_nodes + 1) ** -0.9)
    pop /= pop.sum()
    tri = rng.choice(n_nodes, size=(int(n_triplets * 1.3), 3), p=pop)
    tri = tri[(tri[:, 0] != tri[:, 1]) & (tri[:, 1] != tri[:, 2])
              & (tri[:, 0] != tri[:, 2])][:n_triplets]
    split = DEHyperDataset.make_edge_split(tri, ratio=0.6,
                                           k=negs_per_triplet, seed=2021)
    edges = np.concatenate([tri[:, [0, 1]], tri[:, [1, 2]],
                            tri[:, [0, 2]]])
    path = os.path.join(out_dir, "tags_fixture.npz")
    np.savez_compressed(
        path,
        num_nodes=np.int64(n_nodes),
        edge_index=edges.astype(np.int32),
        train_hedge=split["train"]["hedge"].astype(np.int32),
        valid_hedge=split["valid"]["hedge"].astype(np.int32),
        valid_neg=split["valid"]["hedge_neg"].astype(np.int32),
        test_hedge=split["test"]["hedge"].astype(np.int32),
        test_neg=split["test"]["hedge_neg"].astype(np.int32),
    )
    print(f"wrote {path}: N={n_nodes} train={len(split['train']['hedge'])} "
          f"val={len(split['valid']['hedge'])} "
          f"test={len(split['test']['hedge'])} "
          f"negs/triplet={negs_per_triplet} "
          f"({os.path.getsize(path)/1e6:.1f} MB)")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--names", default="collab,collabs,cites,tags")
    p.add_argument("--negs", type=int, default=100_000)
    p.add_argument("--negs_per_source", type=int, default=50)
    args = p.parse_args()
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "surel_plus_tpu", "data", "fixtures")
    os.makedirs(out, exist_ok=True)
    for name in args.names.split(","):
        if name == "cites":
            build_cites(args.negs_per_source, out)
        elif name == "tags":
            build_tags(args.negs_per_source, out)
        else:
            build(name, args.negs, out)


if __name__ == "__main__":
    main()
