"""Set-sampler property tests.

Invariants 1-5 adopted from the reference C-extension test
(subg_acc/test/test.py:31-45, see SURVEY.md §4), plus semantics checks the
reference validates only implicitly.
"""

import numpy as np
import pytest

from surel_plus_tpu.graph import ring_of_cliques, rmat_graph
from surel_plus_tpu.ops.sampler import sample_gsets, subg_matrix

M, S = 20, 3  # num_walks, walk steps


@pytest.fixture(scope="module")
def sampled():
    g = rmat_graph(500, 2000, seed=3)
    seeds = np.arange(g.num_nodes, dtype=np.int32)
    spg = sample_gsets(g, seeds, num_walks=M, num_steps=S, seed=7,
                       block_size=256)
    return g, spg


def test_inv1_sizes_align(sampled):
    g, spg = sampled
    valid = spg.nodes < np.iinfo(np.int32).max
    assert spg.sizes.sum() == valid.sum()
    assert (spg.eidx > 0).sum() == spg.sizes.sum()


def test_inv2_index_bounds(sampled):
    g, spg = sampled
    valid = spg.nodes < np.iinfo(np.int32).max
    assert spg.nodes[valid].max() <= g.num_nodes - 1
    assert spg.eidx.max() == spg.num_unique_enc  # all enc rows referenced


def test_inv3_root_landing(sampled):
    """Every root row has landing count num_walks at step 0 (LEAD-bit
    guarantee, subg_acc/test/test.py:38-40)."""
    g, spg = sampled
    root_pos = np.argmax(spg.nodes == spg.seeds[:, None], axis=1)
    assert np.all(spg.nodes[np.arange(spg.num_rows), root_pos]
                  == spg.seeds)  # root always in its own set
    root_enc = spg.enc[spg.eidx[np.arange(spg.num_rows), root_pos]]
    assert np.all(root_enc[:, 0] == M)
    # count-0 column is M only for root rows
    nonroot = spg.nodes != spg.seeds[:, None]
    valid = spg.nodes < np.iinfo(np.int32).max
    nr_enc = spg.enc[spg.eidx[nonroot & valid]]
    assert np.all(nr_enc[:, 0] == 0)


def test_inv4_mass_conservation(sampled):
    """Total landing mass: each step distributes exactly num_walks counts
    per seed (subg_acc/test/test.py:41-43)."""
    g, spg = sampled
    valid = spg.nodes < np.iinfo(np.int32).max
    enc_rows = spg.enc[spg.eidx]  # [n, L, ncol]
    per_seed = (enc_rows * valid[:, :, None]).sum(axis=1)  # [n, ncol]
    assert np.all(per_seed == M)  # every column sums to num_walks


def test_inv5_dedup_faithful(sampled):
    """Compressed encodings reproduce per-node raw encodings: dedup maps
    equal rows to one id and distinct rows to distinct ids."""
    g, spg = sampled
    valid = spg.nodes < np.iinfo(np.int32).max
    idx = spg.eidx[valid]
    rows = spg.enc[idx]
    # max per column bounded by num_walks
    assert rows.max() <= M
    # distinct ids -> distinct rows
    uniq_ids = np.unique(idx)
    uniq_rows = spg.enc[uniq_ids]
    assert len(np.unique(uniq_rows.view([('', uniq_rows.dtype)] *
                                        uniq_rows.shape[1]))) == len(uniq_ids)


def test_sets_sorted_padded(sampled):
    g, spg = sampled
    L = spg.bucket
    for b in [0, 7, 123]:
        row = spg.nodes[b]
        sz = spg.sizes[b]
        assert np.all(np.diff(row[:sz]) > 0)
        assert np.all(row[sz:] == np.iinfo(np.int32).max)
        assert np.all(spg.eidx[b, sz:] == 0)
    assert L == M * S + 1


def test_sets_subset_of_reachable():
    """Sampled sets only contain nodes reachable within S steps."""
    g = ring_of_cliques(6, 4)  # clique nodes + bridges
    seeds = np.arange(g.num_nodes, dtype=np.int32)
    spg = sample_gsets(g, seeds, num_walks=10, num_steps=2, seed=0,
                       block_size=32)
    # BFS 2-hop closure per seed
    sp = g.to_scipy()
    reach = ((sp + sp @ sp).toarray() > 0)
    np.fill_diagonal(reach, True)
    for b in range(g.num_nodes):
        sz = spg.sizes[b]
        for v in spg.nodes[b, :sz]:
            assert reach[b, v]


def test_isolated_node_convention():
    """Degree-0 seeds: set = {root}, counts num_walks at every step
    (subg_acc.c:753-761)."""
    g = ring_of_cliques(3, 3)
    # add an isolated node by extending num_nodes
    import dataclasses
    indptr = np.concatenate([g.indptr, [g.indptr[-1]]]).astype(np.int32)
    g2 = dataclasses.replace(g, indptr=indptr)
    iso = g2.num_nodes - 1
    spg = sample_gsets(g2, np.array([iso, 0], np.int32), num_walks=8,
                      num_steps=3, seed=0, block_size=2)
    assert spg.sizes[0] == 1
    assert spg.nodes[0, 0] == iso
    enc = spg.enc[spg.eidx[0, 0]]
    assert np.all(enc == 8)


def test_step0_without_replacement():
    """First hop covers distinct neighbors: with M >= deg every neighbor is
    hit; landing counts at step 1 split M round-robin (subg_acc.c:793-800)."""
    g = ring_of_cliques(4, 4)  # node 0: 3 clique nbrs + 2 bridges -> deg 5
    deg = len(g.neighbors(0))
    num_walks = 8 * deg
    spg = sample_gsets(g, np.array([0], np.int32), num_walks=num_walks,
                       num_steps=1, seed=0, block_size=1)
    nbrs = set(g.neighbors(0).tolist())
    sz = spg.sizes[0]
    got = set(spg.nodes[0, :sz].tolist()) - {0}
    assert got == nbrs  # every 1-hop neighbor visited
    # round-robin: counts at column 1 are num_walks/deg each
    enc_rows = spg.enc[spg.eidx[0, :sz]]
    cnts = sorted(enc_rows[enc_rows[:, 0] == 0][:, 1].tolist())
    assert cnts == [num_walks // deg] * deg


def test_bucket_truncation_preserves_kept_counts():
    """With bucket < unique count, the kept (smallest-id) slots must carry
    exactly their own landing counts — overflow counts are dropped, like
    the C kernel (subg_acc.c:826-836)."""
    g = rmat_graph(100, 800, seed=4)
    seeds = np.arange(32, dtype=np.int32)
    full = sample_gsets(g, seeds, num_walks=8, num_steps=2, seed=5,
                        block_size=32)
    small = sample_gsets(g, seeds, num_walks=8, num_steps=2, seed=5,
                         block_size=32, bucket=4)
    assert small.bucket == 4
    for i in range(32):
        k = small.sizes[i]
        assert k == min(full.sizes[i], 4)
        # kept nodes are the smallest node ids of the full set
        np.testing.assert_array_equal(small.nodes[i, :k],
                                      full.nodes[i, :k])
        want = full.enc[full.eidx[i, :k]]
        got = small.enc[small.eidx[i, :k]]
        np.testing.assert_array_equal(got, want)


def test_determinism():
    g = rmat_graph(200, 800, seed=5)
    seeds = np.arange(g.num_nodes, dtype=np.int32)
    a = sample_gsets(g, seeds, num_walks=M, num_steps=S, seed=9,
                     block_size=64)
    b = sample_gsets(g, seeds, num_walks=M, num_steps=S, seed=9,
                     block_size=64)
    np.testing.assert_array_equal(a.nodes, b.nodes)
    np.testing.assert_array_equal(a.eidx, b.eidx)
    np.testing.assert_array_equal(a.enc, b.enc)


def test_subg_matrix_cli_convention():
    """CLI num_steps=S -> S-1 walk steps -> enc dim S
    (random_walks.py:77-78)."""
    g = rmat_graph(100, 400, seed=2)
    spg = subg_matrix(g, np.arange(g.num_nodes, dtype=np.int32),
                      num_walks=10, num_steps=4, block_size=128)
    assert spg.enc.shape[1] == 4
    assert spg.enc[0].sum() == 0  # prepended zero row


def test_scipy_export_matches_reference_layout(sampled):
    g, spg = sampled
    z = spg.to_scipy(g.num_nodes)
    assert z.has_sorted_indices
    # row nnz == set size; values are 1-based enc indices
    nnz = np.diff(z.indptr)
    np.testing.assert_array_equal(nnz[spg.seeds], spg.sizes)
    assert z.data.min() >= 1


def test_edge_table_walk_bit_exact():
    """The one-row-gather-per-step edge-table walk (walk.py
    `_walk_block_tables`) must be bit-exact with the two-gather baseline
    in both step-0 modes (without-replacement default and the SUREL-v1
    replacement mode)."""
    import jax
    import jax.numpy as jnp

    from surel_plus_tpu.ops import walk as walk_ops
    from surel_plus_tpu.ops.sampler import (device_graph,
                                            shuffled_indices_for)

    g = rmat_graph(800, 4000, seed=11)
    indptr, indices = device_graph(g)
    shuffled = shuffled_indices_for(g, 5)
    etab, stab = walk_ops.build_walk_tables(indptr, indices, shuffled)
    seeds = jnp.arange(800, dtype=jnp.int32)
    key = jax.random.PRNGKey(42)
    for repl in (False, True):
        base = walk_ops._walk_block(indptr, indices, shuffled, seeds,
                                    M, S, key, replacement=repl)
        tab = walk_ops._walk_block_tables(indptr, etab, stab, seeds,
                                          M, S, key, replacement=repl)
        np.testing.assert_array_equal(np.asarray(base), np.asarray(tab))


@pytest.mark.parametrize("mw,ms", [(16, 3),    # lo-only layout (lead 15)
                                   (200, 4)])  # hi-word layout (lead 32)
def test_packed_builder_matches_dense(mw, ms):
    """`_build_sets_packed_block` (prefix-carried, hi-word-skip + packed
    single-operand sort specializations) must equal the dense
    `_build_sets_block` + `_pack_block` reference path, for both the
    lo-only and the hi-word field layouts, with and without the
    (node,vpos) int32 packing (num_nodes=None disables it)."""
    import jax
    import jax.numpy as jnp

    from surel_plus_tpu.ops import walk as walk_ops
    from surel_plus_tpu.ops.sampler import (device_graph,
                                            shuffled_indices_for)

    g = rmat_graph(400, 2400, seed=2)
    indptr, indices = device_graph(g)
    shuffled = shuffled_indices_for(g, 9)
    seeds = jnp.arange(128, dtype=jnp.int32)
    key = jax.random.PRNGKey(3)
    walks = walk_ops._walk_block(indptr, indices, shuffled, seeds,
                                 mw, ms, key)
    bucket = mw * ms + 1
    d_nodes, d_counts, d_sizes = walk_ops._build_sets_block(
        seeds, walks, mw, ms, bucket)
    d_hi, d_lo = walk_ops._pack_block(d_counts, d_nodes, seeds, mw, ms)
    slots = np.arange(bucket, dtype=np.int32)
    dvalid = slots[None, :] < np.asarray(d_sizes)[:, None]
    for num_nodes in (None, 400):
        p_nodes, p_sizes, p_hi, p_lo = walk_ops._build_sets_packed_block(
            seeds, walks, mw, ms, bucket, num_nodes=num_nodes)
        np.testing.assert_array_equal(np.asarray(d_sizes),
                                      np.asarray(p_sizes))
        np.testing.assert_array_equal(np.asarray(d_nodes),
                                      np.asarray(p_nodes))
        np.testing.assert_array_equal(
            np.where(dvalid, np.asarray(d_hi), 0), np.asarray(p_hi))
        np.testing.assert_array_equal(
            np.where(dvalid, np.asarray(d_lo), 0), np.asarray(p_lo))
