import numpy as np

from surel_plus_tpu.graph import csr_from_edges, ring_of_cliques, rmat_graph
from surel_plus_tpu.graph.csr import CSRGraph


def test_csr_from_edges_symmetrize_coalesce():
    edges = np.array([[0, 1], [1, 2], [0, 1], [2, 0], [3, 3]])
    g = csr_from_edges(edges, num_nodes=4)
    # self-loop dropped; symmetric
    assert g.num_nodes == 4
    sp = g.to_scipy()
    assert (sp != sp.T).nnz == 0
    assert sp.diagonal().sum() == 0
    # duplicate (0,1) coalesced with weight 2
    assert sp[0, 1] == 2 and sp[1, 0] == 2
    assert sp[1, 2] == 1 and sp[0, 2] == 1
    # sorted indices per row
    for u in range(4):
        row = g.neighbors(u)
        assert np.all(np.diff(row) > 0)


def test_csr_roundtrip_scipy():
    g = rmat_graph(100, 300, seed=1)
    g2 = CSRGraph.from_scipy(g.to_scipy())
    np.testing.assert_array_equal(g.indptr, g2.indptr)
    np.testing.assert_array_equal(g.indices, g2.indices)


def test_ring_of_cliques_structure():
    g = ring_of_cliques(4, 5)
    assert g.num_nodes == 20
    degs = g.degrees()
    assert degs.min() >= 4
    assert g.has_edge(0, 1) and g.has_edge(1, 0)
    assert not g.has_edge(0, 0)


def test_rmat_power_law_ish():
    g = rmat_graph(2000, 10000, seed=0)
    degs = g.degrees()
    assert degs.max() > 5 * max(degs.mean(), 1)  # skewed
    sp = g.to_scipy()
    assert (sp != sp.T).nnz == 0
