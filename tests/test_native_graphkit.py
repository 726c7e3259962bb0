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


def test_build_csr_weighted_matches_numpy():
    """Native weighted+coalescing build == numpy path, weights included
    (duplicate edges, self loops, symmetrization)."""
    from surel_plus_tpu.graph.native import build_csr_weighted_native

    rng = np.random.default_rng(7)
    edges = rng.integers(0, 200, size=(4000, 2)).astype(np.int32)
    w = rng.uniform(0.5, 2.0, size=4000).astype(np.float32)
    # inject exact duplicates and self loops
    edges[100:200] = edges[:100]
    edges[300:310, 1] = edges[300:310, 0]
    for coalesce in (True, False):
        native = build_csr_weighted_native(
            edges, weights=w, num_nodes=200, coalesce=coalesce)
        if native is None:
            pytest.skip("native toolchain unavailable")
        ref = csr_from_edges(edges, num_nodes=200, weights=w,
                             coalesce=coalesce, prefer_native=False)
        np.testing.assert_array_equal(native.indptr, ref.indptr)
        if coalesce:
            np.testing.assert_array_equal(native.indices, ref.indices)
            np.testing.assert_allclose(native.data, ref.data, rtol=1e-5)
        else:
            # duplicate columns may order their weights differently
            # (std::sort is not stable); compare per-row multisets
            for u in range(200):
                lo, hi = ref.indptr[u], ref.indptr[u + 1]
                np.testing.assert_array_equal(
                    native.indices[lo:hi], ref.indices[lo:hi])
                np.testing.assert_allclose(
                    np.sort(native.data[lo:hi]), np.sort(ref.data[lo:hi]),
                    rtol=1e-5)


def test_csr_from_edges_prefers_native():
    """prefer_native=True routes through the C++ builder with identical
    results to the numpy path."""
    rng = np.random.default_rng(3)
    edges = rng.integers(0, 100, size=(1000, 2)).astype(np.int32)
    w = rng.uniform(0.1, 1.0, size=1000).astype(np.float32)
    a = csr_from_edges(edges, num_nodes=100, weights=w, prefer_native=True)
    b = csr_from_edges(edges, num_nodes=100, weights=w, prefer_native=False)
    np.testing.assert_array_equal(a.indptr, b.indptr)
    np.testing.assert_array_equal(a.indices, b.indices)
    np.testing.assert_allclose(a.data, b.data, rtol=1e-5)


def test_coalesce_edge_list():
    from surel_plus_tpu.graph.csr import coalesce_edge_list

    e = np.array([[3, 1], [0, 2], [3, 1], [0, 2], [0, 1]])
    w = np.array([1.0, 2.0, 3.0, 4.0, 5.0], dtype=np.float32)
    ce, cw = coalesce_edge_list(e, w)
    np.testing.assert_array_equal(ce, [[0, 1], [0, 2], [3, 1]])
    np.testing.assert_allclose(cw, [5.0, 6.0, 4.0])
