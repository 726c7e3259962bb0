"""SpJoin correctness vs a naive python/scipy implementation of the
reference semantics (train.py:13-45, 48-72)."""

import numpy as np
import jax.numpy as jnp

from surel_plus_tpu.graph import rmat_graph
from surel_plus_tpu.ops.join import gather_join, hgather_join
from surel_plus_tpu.ops.sampler import sample_gsets


def _naive_pairs(spg, u, v):
    """Reference semantics: for x in S_u (ascending node id), pair
    (eidx_u[x], eidx_v[x] or 0)."""
    su = {int(n): int(e) for n, e in
          zip(spg.nodes[u][:spg.sizes[u]], spg.eidx[u][:spg.sizes[u]])}
    sv = {int(n): int(e) for n, e in
          zip(spg.nodes[v][:spg.sizes[v]], spg.eidx[v][:spg.sizes[v]])}
    return [(su[x], sv.get(x, 0)) for x in sorted(su)]


def _setup():
    g = rmat_graph(300, 1200, seed=11)
    seeds = np.arange(g.num_nodes, dtype=np.int32)
    spg = sample_gsets(g, seeds, num_walks=12, num_steps=3, seed=5,
                       block_size=128)
    return g, spg


def test_gather_join_matches_naive():
    g, spg = _setup()
    rng = np.random.default_rng(0)
    edges = rng.integers(0, g.num_nodes, size=(2, 16)).astype(np.int32)
    out = gather_join(jnp.asarray(spg.nodes), jnp.asarray(spg.eidx),
                      jnp.asarray(spg.sizes), jnp.asarray(edges))
    eidx = np.asarray(out.eidx)
    mask = np.asarray(out.mask)
    for b in range(edges.shape[1]):
        u, v = int(edges[0, b]), int(edges[1, b])
        want_l = _naive_pairs(spg, u, v)
        got_l = [tuple(p) for p in eidx[0, b][mask[0, b]]]
        assert got_l == want_l, f"left mismatch at query {b}"
        want_r = _naive_pairs(spg, v, u)
        got_r = [tuple(p) for p in eidx[1, b][mask[1, b]]]
        assert got_r == want_r, f"right mismatch at query {b}"


def test_gather_join_sizes_and_masks():
    g, spg = _setup()
    edges = np.array([[0, 5], [1, 9]], dtype=np.int32)
    out = gather_join(jnp.asarray(spg.nodes), jnp.asarray(spg.eidx),
                      jnp.asarray(spg.sizes), jnp.asarray(edges))
    np.testing.assert_array_equal(np.asarray(out.sizes),
                                  spg.sizes[edges])
    np.testing.assert_array_equal(np.asarray(out.mask).sum(-1),
                                  spg.sizes[edges])


def test_hgather_join_matches_naive():
    g, spg = _setup()
    rng = np.random.default_rng(1)
    hedges = rng.integers(0, g.num_nodes, size=(3, 8)).astype(np.int32)
    out = hgather_join(jnp.asarray(spg.nodes), jnp.asarray(spg.eidx),
                       jnp.asarray(spg.sizes), jnp.asarray(hedges))
    eidx = np.asarray(out.eidx)
    mask = np.asarray(out.mask)
    # groups: (u|w), (w|u), (v|w), (w|v)  — train.py:61-68
    for b in range(hedges.shape[1]):
        u, v, w = (int(x) for x in hedges[:, b])
        wants = [_naive_pairs(spg, u, w), _naive_pairs(spg, w, u),
                 _naive_pairs(spg, v, w), _naive_pairs(spg, w, v)]
        for gidx, want in enumerate(wants):
            got = [tuple(p) for p in eidx[gidx, b][mask[gidx, b]]]
            assert got == want, f"group {gidx} query {b}"


def test_bidir_equals_two_multis():
    """The fused bidirectional cross lookup == two independent
    _cross_lookup_multi calls on random unique sorted rows."""
    import jax.numpy as jnp

    from surel_plus_tpu.ops.join import (_cross_lookup_bidir,
                                         _cross_lookup_multi)
    from surel_plus_tpu.ops.walk import INT32_MAX

    rng = np.random.default_rng(4)
    B, L = 7, 13

    def rows():
        nodes = np.full((B, L), INT32_MAX, np.int32)
        h = np.zeros((B, L), np.uint32)
        lo = np.zeros((B, L), np.uint32)
        for b in range(B):
            n = rng.integers(1, L + 1)
            ids = np.sort(rng.choice(40, size=n, replace=False))
            nodes[b, :n] = ids
            h[b, :n] = rng.integers(0, 1 << 16, n)
            lo[b, :n] = rng.integers(0, 1 << 16, n)
        return (jnp.asarray(nodes), jnp.asarray(h), jnp.asarray(lo))

    nu, hu, lu = rows()
    nv, hv, lv = rows()
    cu_h, cu_l, cv_h, cv_l = _cross_lookup_bidir(nu, nv, hu, lu, hv, lv)
    want_u = _cross_lookup_multi(nu, nv, hv, lv)
    want_v = _cross_lookup_multi(nv, nu, hu, lu)
    np.testing.assert_array_equal(np.asarray(cu_h), np.asarray(want_u[0]))
    np.testing.assert_array_equal(np.asarray(cu_l), np.asarray(want_u[1]))
    np.testing.assert_array_equal(np.asarray(cv_h), np.asarray(want_v[0]))
    np.testing.assert_array_equal(np.asarray(cv_l), np.asarray(want_v[1]))
