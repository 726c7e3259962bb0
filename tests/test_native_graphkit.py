"""Native C++ graph-ingest kernels vs the numpy reference paths."""

import numpy as np
import pytest

from surel_plus_tpu.graph.csr import csr_from_edges
from surel_plus_tpu.graph.native import (
    build_csr_native, shuffle_rows_native)
from surel_plus_tpu.graph.synthetic import rmat_graph


def test_build_csr_matches_numpy():
    rng = np.random.default_rng(0)
    edges = rng.integers(0, 500, size=(5000, 2)).astype(np.int32)
    native = build_csr_native(edges, num_nodes=500)
    if native is None:
        pytest.skip("native toolchain unavailable")
    ref = csr_from_edges(edges, num_nodes=500, coalesce=False)
    np.testing.assert_array_equal(native.indptr, ref.indptr)
    np.testing.assert_array_equal(native.indices, ref.indices)


def test_shuffle_rows_is_row_permutation():
    g = rmat_graph(300, 2000, seed=1)
    out = shuffle_rows_native(g, seed=5)
    if out is None:
        pytest.skip("native toolchain unavailable")
    for u in (0, 7, 123):
        lo, hi = g.indptr[u], g.indptr[u + 1]
        np.testing.assert_array_equal(np.sort(out[lo:hi]),
                                      g.indices[lo:hi])
    # deterministic per seed, different across seeds
    out2 = shuffle_rows_native(g, seed=5)
    np.testing.assert_array_equal(out, out2)
    out3 = shuffle_rows_native(g, seed=6)
    assert not np.array_equal(out, out3)
