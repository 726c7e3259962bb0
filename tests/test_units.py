"""Micro-tests for low-level primitives."""

import jax
import jax.numpy as jnp
import numpy as np

from surel_plus_tpu.ops.walk import (
    enc_field_layout, rows_searchsorted, unpack_encodings)
from surel_plus_tpu.train.device import riffle_permutation


def test_rows_searchsorted_matches_numpy():
    rng = np.random.default_rng(0)
    for B, N, T in ((1, 1, 3), (4, 7, 5), (3, 128, 200)):
        a = np.sort(rng.integers(0, 50, size=(B, N)), axis=1)
        t = rng.integers(-5, 55, size=(B, T))
        got = np.asarray(rows_searchsorted(jnp.asarray(a.astype(np.int32)),
                                           jnp.asarray(t.astype(np.int32))))
        want = np.stack([np.searchsorted(a[b], t[b]) for b in range(B)])
        np.testing.assert_array_equal(got, want)


def test_enc_field_layout_no_straddle():
    for M, S in ((100, 3), (200, 4), (50, 1), (1000, 4), (32767, 3)):
        shift, starts, lead = enc_field_layout(M, S)
        assert shift == int(M).bit_length()
        for j, b in starts.items():
            # no field crosses the 32-bit word boundary
            assert not (b < 32 < b + shift), (M, S, j, b)
        assert not (lead < 32 < lead + 1)
        assert lead + 1 <= 62
        # fields don't overlap
        spans = sorted([(b, b + shift) for b in starts.values()]
                       + [(lead, lead + 1)])
        for (a0, a1), (b0, b1) in zip(spans, spans[1:]):
            assert a1 <= b0


def test_enc_field_layout_rejects_overflow():
    import pytest

    with pytest.raises(ValueError):
        enc_field_layout(32767, 5)  # 5*15+1 = 76 bits


def test_unpack_encodings_roundtrip():
    rng = np.random.default_rng(1)
    M, S = 100, 3
    shift, starts, lead = enc_field_layout(M, S)
    counts = rng.integers(0, M + 1, size=(20, S + 1)).astype(np.uint64)
    is_root = rng.integers(0, 2, 20).astype(np.uint64)
    counts[:, 0] = is_root * M
    packed = np.zeros(20, np.uint64)
    for j in range(1, S + 1):
        packed |= counts[:, j] << np.uint64(starts[j])
    packed |= is_root << np.uint64(lead)
    out = unpack_encodings(packed, M, S)
    np.testing.assert_array_equal(out, counts.astype(np.int32))


def test_riffle_is_permutation():
    for rows, cols in ((4, 8), (7, 5)):
        idx = np.asarray(riffle_permutation(jax.random.PRNGKey(3),
                                            rows, cols))
        flat = np.sort(idx.reshape(-1))
        np.testing.assert_array_equal(flat, np.arange(rows * cols))
    # different keys give different orders
    a = np.asarray(riffle_permutation(jax.random.PRNGKey(1), 4, 8))
    b = np.asarray(riffle_permutation(jax.random.PRNGKey(2), 4, 8))
    assert not np.array_equal(a, b)
