import numpy as np
import pytest

from surel_plus_tpu.graph.io import (
    load_edgelist, load_graph_npz, save_graph_npz)
from surel_plus_tpu.graph.synthetic import rmat_graph


def test_edgelist_roundtrip(tmp_path):
    p = tmp_path / "g.edgelist"
    p.write_text("# comment\n0 1\n1 2\n2 0\n3 0\n")
    g = load_edgelist(str(p))
    assert g.num_nodes == 4
    assert g.has_edge(1, 0)  # symmetrized
    assert g.has_edge(0, 3)


def test_npz_roundtrip(tmp_path):
    g = rmat_graph(100, 400, seed=0)
    p = str(tmp_path / "g.npz")
    save_graph_npz(p, g)
    g2 = load_graph_npz(p)
    np.testing.assert_array_equal(g.indptr, g2.indptr)
    np.testing.assert_array_equal(g.indices, g2.indices)
