import numpy as np

from surel_plus_tpu.graph.datasets import (
    LinkPropDataset, synthetic_hyper_data, synthetic_link_data)
from surel_plus_tpu.graph.negative import negative_sampling
from surel_plus_tpu.graph.splits import get_pos_neg_edges


def test_negative_sampling_avoids_existing():
    edges = np.array([[0, 1, 2], [1, 2, 0]])
    neg = negative_sampling(edges, num_nodes=10, num_neg_samples=30,
                            rng=np.random.default_rng(0))
    assert neg.shape == (2, 30)
    existing = {(0, 1), (1, 2), (2, 0)}
    for u, v in neg.T:
        assert (u, v) not in existing
        assert u != v


def test_link_dataset_process():
    raw = synthetic_link_data(num_nodes=300, num_edges=1500, seed=1)
    ds = LinkPropDataset(raw, mask_ratio=0.1, k=5,
                         rng=np.random.default_rng(0))
    graphs = ds.process()
    g = graphs["train"]
    assert g.num_nodes == 300
    sp = g.to_scipy()
    assert (sp != sp.T).nnz == 0 and sp.diagonal().sum() == 0
    # pos edges masked out of observed graph
    n_in = sum(g.has_edge(u, v) for u, v in ds.pos_edge[:50])
    assert n_in == 0
    # neg count = num_pos * k (when < len_train)
    assert len(ds.neg_edge) == min(ds.num_pos * 5, ds.len_train)
    # inference graph without use_val == val graph
    assert graphs["test"] is graphs["val"]


def test_link_dataset_use_val():
    raw = synthetic_link_data(num_nodes=300, num_edges=1500, seed=2)
    ds = LinkPropDataset(raw, mask_ratio=0.1, use_val=True,
                         rng=np.random.default_rng(0))
    graphs = ds.process()
    assert graphs["test"].num_edges > graphs["val"].num_edges


def test_get_pos_neg_edges_edge_format():
    raw = synthetic_link_data(num_nodes=200, num_edges=1000, seed=3)
    pos, neg = get_pos_neg_edges("valid", raw.split_edge, raw.edge_index,
                                 200)
    assert pos.shape[0] == 2 and neg.shape[0] == 2
    pos50, neg50 = get_pos_neg_edges("valid", raw.split_edge,
                                     raw.edge_index, 200, percent=50)
    assert pos50.shape[1] == pos.shape[1] // 2
    # deterministic subsampling (seed 123)
    pos50b, _ = get_pos_neg_edges("valid", raw.split_edge, raw.edge_index,
                                  200, percent=50)
    np.testing.assert_array_equal(pos50, pos50b)


def test_get_pos_neg_edges_source_target():
    raw = synthetic_link_data(num_nodes=200, num_edges=1000, seed=4,
                              mrr_style=True, neg_per_query=7)
    pos, neg = get_pos_neg_edges("test", raw.split_edge, raw.edge_index,
                                 200)
    assert neg.shape[1] == pos.shape[1] * 7
    # negs grouped per source: first 7 negs share source with pos 0
    assert np.all(neg[0, :7] == pos[0, 0])


def test_link_dataset_weighted():
    import dataclasses

    raw = synthetic_link_data(num_nodes=200, num_edges=1000, seed=5)
    rng = np.random.default_rng(0)
    raw = dataclasses.replace(
        raw, edge_weight=rng.integers(1, 5, raw.split_edge["train"]
                                      ["edge"].shape[0]).astype(np.float32))
    # weights live alongside the train edges in OGB's collab layout
    raw.split_edge["train"]["weight"] = raw.edge_weight
    raw.split_edge["valid"]["weight"] = np.ones(
        len(raw.split_edge["valid"]["edge"]), np.float32)
    ds = LinkPropDataset(raw, mask_ratio=0.1, use_weight=True,
                         use_coalesce=True, use_val=True,
                         rng=np.random.default_rng(0))
    graphs = ds.process()
    sp = graphs["train"].to_scipy()
    assert sp.data.max() > 1  # weights survived into the CSR
    assert (sp != sp.T).nnz == 0


def test_hyper_dataset():
    ds = synthetic_hyper_data(num_nodes=100, num_triplets=300, seed=0)
    g = ds.process()
    assert g.num_nodes == 100
    assert ds.pos_hedge.shape[1] == 3
    assert len(ds.neg_hedge) == len(ds.pos_hedge) * ds.k
    pos, neg = get_pos_neg_edges("valid", ds.split_edge, None, 100)
    assert pos.shape[0] == 3 and neg.shape[0] == 3
