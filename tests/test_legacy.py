"""SUREL-v1 legacy API surface tests (walk_sampler / rw_matrix /
batch_sampler / walk_join)."""

import numpy as np
import pytest

from surel_plus_tpu.graph import ring_of_cliques, rmat_graph
from surel_plus_tpu.ops.legacy import (
    batch_sampler, np_sampling, rw_matrix, walk_join, walk_sampler)

M, S = 10, 2  # walks, walk steps


@pytest.fixture(scope="module")
def g():
    return rmat_graph(200, 900, seed=0)


def test_walk_sampler_shapes(g):
    seeds = np.arange(50, dtype=np.int32)
    walks, (nodes, counts, sizes) = walk_sampler(
        g, seeds, num_walks=M, num_steps=S, block_size=50)
    assert walks.shape == (50, M * (S + 1))
    # every walk starts at its root
    roots = walks.reshape(50, M, S + 1)[:, :, 0]
    assert np.all(roots == seeds[:, None])
    # counts: landing mass per column == M
    valid = np.arange(nodes.shape[1])[None, :] < sizes[:, None]
    per_seed = (counts * valid[:, :, None]).sum(axis=1)
    assert np.all(per_seed == M)


def test_walk_sampler_wo_replacement_first_hop(g):
    seeds = np.arange(30, dtype=np.int32)
    walks, _ = walk_sampler(g, seeds, num_walks=M, num_steps=S,
                            replacement=False, block_size=30)
    w = walks.reshape(30, M, S + 1)
    for i in range(30):
        deg = len(g.neighbors(seeds[i]))
        first = w[i, :, 1]
        if deg >= M:
            assert len(np.unique(first)) == M  # distinct first hops
        elif deg > 0:
            assert set(first) == set(g.neighbors(seeds[i]))


def test_rw_matrix(g):
    seeds = np.arange(g.num_nodes, dtype=np.int32)
    z, freqs = rw_matrix(g, seeds, num_walks=M, num_steps=S + 1)
    assert z.shape == (200, 200)
    assert z.data.min() >= 1
    assert freqs.shape[1] == S + 1
    assert freqs[0].sum() == 0  # prepended zero row
    # every stored value indexes a valid freq row
    assert z.data.max() <= len(freqs) - 1
    # dedup really reduces
    assert len(freqs) - 1 <= z.nnz


def test_np_sampling(g):
    seeds = np.arange(40, dtype=np.int32)
    keys, freqs, sizes = np_sampling(g, seeds, bsize=40, num_walks=M,
                                     num_steps=S)
    assert len(keys) == sizes.sum()
    assert freqs.shape == (sizes.sum(), S + 1)


def test_batch_sampler(g):
    union, walks = batch_sampler(g, np.array([0, 5, 9], np.int32),
                                 num_walks=M, num_steps=S)
    assert np.all(np.diff(union) > 0)
    assert set(walks.ravel().tolist()) <= set(union.tolist())
    assert walks.shape == (3, M, S)


def test_walk_join_matches_host_loop():
    """The r5 device walk_join must reproduce the reference-semantics
    host loop (np.unique per seed + searchsorted per query) exactly."""
    rng = np.random.default_rng(5)
    n, W, B = 20, 12, 16
    walks = rng.integers(0, 30, size=(n, W)).astype(np.int32)
    queries = rng.integers(0, n, size=(2, B)).astype(np.int32)
    left, right = walk_join(walks, np.arange(n, dtype=np.int32),
                            queries)

    def host(u, v):
        vv = np.unique(walks[v])
        pos = np.minimum(np.searchsorted(vv, walks[u]), len(vv) - 1)
        return np.where(vv[pos] == walks[u], pos + 1, 0)

    for b, (u, v) in enumerate(queries.T):
        np.testing.assert_array_equal(left[b], host(u, v))
        np.testing.assert_array_equal(right[b], host(v, u))


def test_walk_join():
    g = ring_of_cliques(3, 4)
    seeds = np.arange(g.num_nodes, dtype=np.int32)
    walks, _ = walk_sampler(g, seeds, num_walks=4, num_steps=2,
                            block_size=16)
    queries = np.array([[0, 1], [1, 2]], np.int32)
    left, right = walk_join(walks, seeds, queries)
    assert left.shape == right.shape == (2, walks.shape[1])
    # join index 0 <=> node absent from the partner's walks; positive
    # entries point at the correct unique node
    u, v = 0, 1
    vv = np.unique(walks[v])
    for slot, idx in enumerate(left[0]):
        node = walks[u, slot]
        if idx > 0:
            assert vv[idx - 1] == node
        else:
            assert node not in vv
