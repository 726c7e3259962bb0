"""PPR sampler (native C++ push-flow vs exact dense PPR), metric-path
encoders, and the scalar SpJoin."""

import numpy as np
import pytest

from surel_plus_tpu.graph import ring_of_cliques, rmat_graph
from surel_plus_tpu.ops.encoders import (
    ScalarSpG, encoding, gather_join_scalar, scalar_spg_from_csr)
from surel_plus_tpu.ops.ppr import ppr_topk, topk_ppr_matrix


def _exact_ppr(g, seed, alpha):
    """Dense fixed-point: pi = alpha * e + (1-alpha) * P^T? — reference
    pushes along out-edges with res/deg[u], i.e. pi = alpha*e + (1-alpha)
    pi P with P = D^-1 A (row-stochastic)."""
    n = g.num_nodes
    A = g.to_scipy().toarray() > 0
    deg = A.sum(1)
    P = A / np.maximum(deg[:, None], 1)
    e = np.zeros(n)
    e[seed] = 1.0
    pi = e * alpha
    r = e * alpha
    # power series: pi = alpha * sum_t ((1-alpha) P)^t e  (push semantics)
    pi = np.zeros(n)
    term = alpha * e
    for _ in range(500):
        pi += term
        term = (1 - alpha) * (term @ P)
    return pi


def test_ppr_matches_exact():
    g = ring_of_cliques(4, 5)
    seeds = np.array([0, 7], dtype=np.int32)
    nodes, scores, counts = ppr_topk(g.indptr, g.indices, seeds,
                                     alpha=0.15, eps=1e-6, topk=20)
    for i, s in enumerate(seeds):
        exact = _exact_ppr(g, s, 0.15)
        got = np.zeros(g.num_nodes)
        got[nodes[i, :counts[i]]] = scores[i, :counts[i]]
        # push-flow truncates at eps; tolerance proportional
        assert np.abs(got - exact).max() < 5e-4
        # scores sorted descending
        sc = scores[i, :counts[i]]
        assert np.all(np.diff(sc) <= 1e-9)


def test_ppr_device_matches_exact_and_host():
    """Device truncated power iteration (ops/ppr_device.py): scores match
    the dense fixed point AND the C++ push within the truncation
    tolerance, on both a structured and a power-law graph."""
    from surel_plus_tpu.ops.ppr_device import ppr_topk_device

    for g, check_exact in ((ring_of_cliques(4, 5), True),
                           (rmat_graph(300, 2400, seed=7), False)):
        # _exact_ppr binarizes the adjacency, so it is only comparable
        # on multi-edge-free graphs; rmat rows are checked vs the push
        # (which, like the device path, honors edge multiplicity)
        seeds = np.array([0, 7, g.num_nodes - 1], dtype=np.int32)
        alpha, eps, topk = 0.15, 1e-6, 20
        dn, ds, dc = ppr_topk_device(g.indptr, g.indices, seeds, alpha,
                                     eps, topk, block=2)
        hn, hs, hc = ppr_topk(g.indptr, g.indices, seeds, alpha, eps,
                              topk)
        for i, s in enumerate(seeds):
            got = np.zeros(g.num_nodes)
            got[dn[i, :dc[i]]] = ds[i, :dc[i]]
            if check_exact:
                exact = _exact_ppr(g, s, alpha)
                assert np.abs(got - exact).max() < 5e-4
            host = np.zeros(g.num_nodes)
            host[hn[i, :hc[i]]] = hs[i, :hc[i]]
            assert np.abs(got - host).max() < 5e-4
            sc = ds[i, :dc[i]]
            assert np.all(np.diff(sc) <= 1e-9)


def test_topk_ppr_matrix_device_method():
    g = ring_of_cliques(3, 6)
    idx = np.arange(g.num_nodes)
    md = topk_ppr_matrix(g, 0.2, 1e-5, idx, 10, normalization="sym",
                         method="device").toarray()
    mh = topk_ppr_matrix(g, 0.2, 1e-5, idx, 10,
                         normalization="sym").toarray()
    # same sparsity pattern up to eps-truncation; values within tolerance
    both = (md > 0) & (mh > 0)
    assert both.sum() >= 0.9 * max((mh > 0).sum(), 1)
    assert np.abs(md[both] - mh[both]).max() < 5e-4


def test_ppr_topk_truncation():
    g = rmat_graph(300, 2000, seed=0)
    seeds = np.arange(20, dtype=np.int32)
    nodes, scores, counts = ppr_topk(g.indptr, g.indices, seeds,
                                     alpha=0.2, eps=1e-4, topk=5)
    assert np.all(counts <= 5)
    assert scores.shape == (20, 5)


def test_topk_ppr_matrix_normalizations():
    g = rmat_graph(200, 1200, seed=1)
    idx = np.arange(50)
    for norm in ("row", "sym", "col"):
        m = topk_ppr_matrix(g, 0.2, 1e-4, idx, 10, normalization=norm)
        assert m.shape == (50, 200)
        assert m.nnz > 0
    with pytest.raises(ValueError):
        topk_ppr_matrix(g, 0.2, 1e-4, idx, 10, normalization="bogus")


def test_encoding_transforms():
    g = rmat_graph(100, 600, seed=2)
    adj = g.to_scipy()
    x = topk_ppr_matrix(g, 0.3, 1e-4, np.arange(100), 20,
                        normalization="sym")
    x_ppr, _ = encoding(x.copy(), adj, "PPR")
    assert x_ppr.data.max() <= 1.0 + 1e-6
    assert x_ppr.data.min() > 0
    x_spd, _ = encoding(x.copy().tocsr(), adj, "SPD")
    assert np.allclose(np.asarray(x_spd[np.arange(100),
                                        np.arange(100)]).ravel(), 2.3)
    x_deg, agg = encoding(x.copy().tocsr(), adj, "DEG")
    assert agg is not None
    with pytest.raises(NotImplementedError):
        encoding(x, adj, "nope")


def test_scalar_spg_and_join():
    import jax.numpy as jnp

    g = rmat_graph(120, 700, seed=3)
    x = topk_ppr_matrix(g, 0.3, 1e-4, np.arange(120), 16,
                        normalization="sym")
    x, _ = encoding(x.tocsr(), g.to_scipy(), "PPR")
    sspg = scalar_spg_from_csr(x.tocsr())
    assert sspg.nodes.shape == sspg.values.shape
    # ascending node ids in valid region
    for i in (0, 11):
        k = sspg.sizes[i]
        assert np.all(np.diff(sspg.nodes[i, :k]) > 0)

    dev = sspg.device()
    edges = jnp.asarray(np.array([[0, 3], [1, 9]], np.int32))
    out = gather_join_scalar(dev.nodes, dev.eidx, dev.sizes, edges)
    assert out.eidx.shape == (2, 2, sspg.bucket, 2)
    assert out.eidx.dtype == jnp.float32
    # anchor values match the SpG rows
    np.testing.assert_allclose(np.asarray(out.eidx)[0, 0, :, 0],
                               sspg.values[0])
    # cross values: element also in the other set carries its value there
    u, v = 0, 1
    sv = {int(n): float(val) for n, val in
          zip(sspg.nodes[v][:sspg.sizes[v]],
              sspg.values[v][:sspg.sizes[v]])}
    for slot in range(sspg.sizes[u]):
        x_node = int(sspg.nodes[u, slot])
        want = sv.get(x_node, 0.0)
        assert np.isclose(np.asarray(out.eidx)[0, 0, slot, 1], want)


def test_net_scalar_path():
    import jax
    import jax.numpy as jnp

    from surel_plus_tpu.models import Net
    from surel_plus_tpu.ops.join import JoinedBatch

    rng = np.random.default_rng(0)
    B, L = 4, 8
    vals = jnp.asarray(rng.random((2, B, L, 2)).astype(np.float32))
    mask = jnp.asarray(np.ones((2, B, L), bool))
    sizes = jnp.asarray(np.full((2, B), L, np.int32))
    joined = JoinedBatch(eidx=vals, mask=mask, sizes=sizes)
    dummy_enc = jnp.zeros((1, 1), jnp.float32)
    net = Net(input_dim=1, hidden_dim=16, aggrs="mean")
    params = net.init(jax.random.PRNGKey(0), dummy_enc, joined)
    out = net.apply(params, dummy_enc, joined)
    assert out.shape == (B,)


def test_scalar_spg_from_csr_vectorized_semantics():
    """The vectorized padded scatter == the naive per-row loop, including
    bucket truncation (rows longer than L keep their first L sorted
    entries) and empty rows."""
    import scipy.sparse as sp

    rng = np.random.default_rng(7)
    n, m = 40, 60
    dense = rng.random((n, m)) * (rng.random((n, m)) < 0.2)
    dense[5] = 0.0                               # empty row
    dense[6] = rng.random(m)                     # full row (truncates)
    mat = sp.csr_matrix(dense)
    for bucket in (None, 8):
        got = scalar_spg_from_csr(mat, bucket=bucket)
        L = got.bucket
        for i in range(n):
            lo, hi = mat.indptr[i], mat.indptr[i + 1]
            k = min(hi - lo, L)
            assert got.sizes[i] == k
            np.testing.assert_array_equal(got.nodes[i, :k],
                                          mat.indices[lo:lo + k])
            np.testing.assert_allclose(got.values[i, :k],
                                       mat.data[lo:lo + k])
            assert (got.nodes[i, k:] == np.iinfo(np.int32).max).all()
            assert (got.values[i, k:] == 0).all()
