"""Pallas kernel tests (interpret mode on CPU): the equality-contraction
join must match the sort-based merge join exactly."""

import jax.numpy as jnp
import numpy as np

from surel_plus_tpu.ops.join import _cross_lookup_multi
from surel_plus_tpu.ops.pallas.join_kernel import pallas_cross_lookup_pair
from surel_plus_tpu.ops.walk import INT32_MAX


def _rows(rng, B, L, hi_max=1 << 30):
    nodes = np.sort(rng.integers(0, 50_000, size=(B, L)), axis=1) \
        + np.arange(L)[None, :]
    sizes = rng.integers(1, L + 1, size=B)
    mask = np.arange(L)[None, :] < sizes[:, None]
    nodes = np.where(mask, nodes, INT32_MAX).astype(np.int32)
    hi = np.where(mask, rng.integers(0, hi_max, size=(B, L)), 0)
    lo = np.where(mask, rng.integers(0, 1 << 32, size=(B, L),
                                     dtype=np.int64), 0)
    return (jnp.asarray(nodes), jnp.asarray(hi.astype(np.uint32)),
            jnp.asarray(lo.astype(np.uint32)))


def test_pallas_join_matches_merge():
    rng = np.random.default_rng(0)
    B, L = 16, 37
    # sample sorted subsets of a shared pool => natural overlaps while
    # keeping rows sorted/unique (the merge join's contract)
    pool = np.arange(0, 4 * L) * 3
    na_np = np.stack([np.sort(rng.choice(pool, L, replace=False))
                      for _ in range(B)]).astype(np.int32)
    nb_np = np.stack([np.sort(rng.choice(pool, L, replace=False))
                      for _ in range(B)]).astype(np.int32)
    na = jnp.asarray(na_np)
    nb = jnp.asarray(nb_np)
    hib = jnp.asarray(rng.integers(0, 1 << 30, size=(B, L))
                      .astype(np.uint32))
    lob = jnp.asarray(rng.integers(0, 1 << 32, size=(B, L),
                                   dtype=np.int64).astype(np.uint32))
    assert np.intersect1d(na_np[0], nb_np[0]).size > 0
    want_hi, want_lo = _cross_lookup_multi(na, nb, hib, lob)
    got_hi, got_lo = pallas_cross_lookup_pair(na, nb, hib, lob,
                                              interpret=True)
    np.testing.assert_array_equal(np.asarray(want_hi), np.asarray(got_hi))
    np.testing.assert_array_equal(np.asarray(want_lo), np.asarray(got_lo))


def test_pallas_join_full_word_payloads():
    """Payloads exercising all 32 bits survive the 16-bit-half
    contraction."""
    rng = np.random.default_rng(1)
    B, L = 8, 16
    na, _, _ = _rows(rng, B, L)
    nb = na  # full overlap
    hib = jnp.asarray(
        rng.integers(0, 1 << 32, size=(B, L), dtype=np.int64)
        .astype(np.uint32))
    lob = jnp.asarray(
        rng.integers(0, 1 << 32, size=(B, L), dtype=np.int64)
        .astype(np.uint32))
    valid = np.asarray(na) != INT32_MAX
    hib = jnp.where(valid, hib, 0)
    lob = jnp.where(valid, lob, 0)
    got_hi, got_lo = pallas_cross_lookup_pair(na, nb, hib, lob,
                                              interpret=True)
    np.testing.assert_array_equal(np.asarray(got_hi)[valid],
                                  np.asarray(hib)[valid])
    np.testing.assert_array_equal(np.asarray(got_lo)[valid],
                                  np.asarray(lob)[valid])
