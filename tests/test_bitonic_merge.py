"""Bitonic merge kernel (interpret mode on CPU): exact equality with
lax.sort on already-sorted halves, and the keys join end-to-end with the
bitonic path forced on."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from surel_plus_tpu.graph.synthetic import rmat_graph
from surel_plus_tpu.ops import join as join_mod
from surel_plus_tpu.ops.join import make_keys_join
from surel_plus_tpu.ops.pallas import bitonic_merge
from surel_plus_tpu.ops.pallas.bitonic_merge import bitonic_merge_pairs
from surel_plus_tpu.ops.sampler import sample_gsets_device_keys


@pytest.mark.parametrize("B,L", [(7, 13), (4, 301), (3, 5), (9, 128)])
def test_merge_matches_lax_sort(B, L):
    rng = np.random.default_rng(L)
    # distinct keys via the tag bit, like the join's packed keys
    ka = np.sort(rng.integers(0, 1 << 31, size=(B, L)).astype(np.uint32)
                 * 2, axis=1)
    kb = np.sort((rng.integers(0, 1 << 31, size=(B, L)).astype(np.uint32)
                  * 2) | 1, axis=1)
    pa = rng.integers(0, 1 << 32, size=(B, L), dtype=np.int64).astype(
        np.uint32)
    pb = rng.integers(0, 1 << 32, size=(B, L), dtype=np.int64).astype(
        np.uint32)
    want_k, want_p = jax.lax.sort(
        (jnp.asarray(np.concatenate([ka, kb], 1)),
         jnp.asarray(np.concatenate([pa, pb], 1))), num_keys=1)
    got_k, got_p = bitonic_merge_pairs(
        jnp.asarray(ka), jnp.asarray(pa), jnp.asarray(kb),
        jnp.asarray(pb), interpret=True)
    np.testing.assert_array_equal(np.asarray(got_k), np.asarray(want_k))
    np.testing.assert_array_equal(np.asarray(got_p), np.asarray(want_p))


def test_keys_join_bitonic_matches_sort_path():
    """Full join (aligned feats + sorted cross planes) is identical with
    the bitonic merge forced on."""
    g = rmat_graph(300, 1500, seed=7)
    spgk = sample_gsets_device_keys(
        g, np.arange(300, dtype=np.int32), num_walks=16, num_steps=3,
        seed=3, block_size=128)
    rng = np.random.default_rng(0)
    edges = jnp.asarray(rng.integers(0, 300, size=(2, 32)).astype(np.int32))
    join = make_keys_join(16, 3)

    ref = join(spgk.nodes, spgk.khi, spgk.klo, spgk.sizes, edges)
    bitonic_merge.FORCE_BITONIC = True
    try:
        got = join(spgk.nodes, spgk.khi, spgk.klo, spgk.sizes, edges)
    finally:
        bitonic_merge.FORCE_BITONIC = None

    np.testing.assert_allclose(np.asarray(got.eidx), np.asarray(ref.eidx))
    np.testing.assert_array_equal(np.asarray(got.mask),
                                  np.asarray(ref.mask))
    np.testing.assert_array_equal(np.asarray(got.kown),
                                  np.asarray(ref.kown))
    # sorted-plane contract: identical masks; payload equality where
    # selected (sentinel ties may order pad slots differently, but those
    # are masked out on both sides)
    np.testing.assert_array_equal(np.asarray(got.kcross_mask),
                                  np.asarray(ref.kcross_mask))
    m = np.asarray(ref.kcross_mask).any(axis=0)
    np.testing.assert_array_equal(np.asarray(got.kcross)[m],
                                  np.asarray(ref.kcross)[m])
