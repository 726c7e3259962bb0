import numpy as np

from surel_plus_tpu.graph.datasets import DEHDataset, synthetic_hetero_data
from surel_plus_tpu.graph.splits import get_pos_neg_edges


def test_hetero_process():
    ds = synthetic_hetero_data(num_authors=100, num_papers=150,
                               num_writes=600, num_cites=800,
                               relation="cite", seed=0)
    graphs = ds.process()
    g = graphs["train"]
    assert g.num_nodes == 250
    sp = g.to_scipy()
    assert (sp != sp.T).nnz == 0 and sp.diagonal().sum() == 0
    # masked positives excluded from observed graph is NOT guaranteed here
    # (obsrv union includes aux relation), but pos edges exist and negs
    # follow the num_pos*k rule
    assert len(ds.neg_edge) == min(ds.num_pos * ds.k, ds.len_train)
    # val graph includes the full train pool + aux edges
    assert graphs["val"].num_edges >= g.num_edges


def test_hetero_write_relation():
    ds = synthetic_hetero_data(relation="write", seed=1)
    graphs = ds.process()
    # predicted relation is bipartite author-paper
    assert np.all(ds.pos_edge[:, 0] < 300)
    assert np.all(ds.pos_edge[:, 1] >= 300)


def test_hetero_mrr_splits():
    ds = synthetic_hetero_data(seed=2)
    pos, neg = get_pos_neg_edges("valid", ds.split_edge, None,
                                 ds.num_nodes)
    k = neg.shape[1] // pos.shape[1]
    assert k >= 1
    assert np.all(neg[0, :k] == pos[0, 0])  # per-source negatives
