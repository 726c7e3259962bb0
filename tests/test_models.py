"""Model-layer tests: shapes, masking invariance, aggregator semantics,
and the embed-table join rewrite vs direct per-element embedding."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from surel_plus_tpu.models import HONet, Net
from surel_plus_tpu.models.layers import (
    AttentionAggregation, LSTMAggregation, masked_mean)
from surel_plus_tpu.ops.join import JoinedBatch

B, L, S, U, H = 6, 10, 4, 17, 16


def _fake_joined(rng, q=2):
    eidx = rng.integers(0, U + 1, size=(q, B, L, 2)).astype(np.int32)
    sizes = rng.integers(1, L + 1, size=(q, B)).astype(np.int32)
    mask = np.arange(L)[None, None, :] < sizes[:, :, None]
    eidx = np.where(mask[..., None], eidx, 0)
    return JoinedBatch(eidx=jnp.asarray(eidx), mask=jnp.asarray(mask),
                       sizes=jnp.asarray(sizes))


def _enc_table(rng):
    enc = rng.random((U + 1, S)).astype(np.float32)
    enc[0] = 0
    return jnp.asarray(enc)


@pytest.mark.parametrize("aggrs", ["mean", "attn", "lstm"])
def test_net_forward_shapes(aggrs):
    rng = np.random.default_rng(0)
    joined = _fake_joined(rng)
    enc = _enc_table(rng)
    net = Net(input_dim=S, hidden_dim=H, aggrs=aggrs)
    params = net.init(jax.random.PRNGKey(0), enc, joined)
    out = net.apply(params, enc, joined)
    assert out.shape == (B,)
    assert np.all(np.isfinite(np.asarray(out)))


def test_net_mask_invariance():
    """Padding slots must not affect the output."""
    rng = np.random.default_rng(1)
    joined = _fake_joined(rng)
    enc = _enc_table(rng)
    net = Net(input_dim=S, hidden_dim=H, aggrs="attn")
    params = net.init(jax.random.PRNGKey(0), enc, joined)
    out1 = net.apply(params, enc, joined)
    # corrupt padded eidx slots; mask unchanged
    garbage = np.where(np.asarray(joined.mask)[..., None],
                       np.asarray(joined.eidx), U)
    joined2 = joined._replace(eidx=jnp.asarray(garbage))
    out2 = net.apply(params, enc, joined2)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2),
                               rtol=1e-5)


def test_net_feature_branch():
    rng = np.random.default_rng(2)
    joined = _fake_joined(rng)
    enc = _enc_table(rng)
    feat = jnp.asarray(rng.random((2, B, 7)).astype(np.float32))
    net = Net(input_dim=S, hidden_dim=H, x_dim=7, use_feature=True)
    params = net.init(jax.random.PRNGKey(0), enc, joined, feat)
    out = net.apply(params, enc, joined, feat)
    assert out.shape == (B,)


def test_masked_mean():
    x = jnp.asarray(np.arange(24, dtype=np.float32).reshape(2, 3, 4))
    mask = jnp.asarray([[True, True, False], [True, False, False]])
    out = masked_mean(x, mask)
    np.testing.assert_allclose(out[0], x[0, :2].mean(axis=0))
    np.testing.assert_allclose(out[1], x[1, 0])


def test_attention_reduces_to_weighted_sum():
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.random((2, 5, H)).astype(np.float32))
    mask = jnp.asarray([[True] * 5, [True, True, True, False, False]])
    mod = AttentionAggregation(H)
    params = mod.init(jax.random.PRNGKey(0), x, mask)
    out = mod.apply(params, x, mask)
    assert out.shape == (2, H)
    # masked row: recompute on the valid prefix only
    out2 = mod.apply(params, x[1:, :3], jnp.asarray([[True] * 3]))
    np.testing.assert_allclose(np.asarray(out[1]), np.asarray(out2[0]),
                               rtol=1e-5)


def test_lstm_ignores_padding():
    rng = np.random.default_rng(4)
    x = np.asarray(rng.random((2, 5, H)).astype(np.float32))
    mask = jnp.asarray([[True] * 5, [True, True, False, False, False]])
    mod = LSTMAggregation(H)
    params = mod.init(jax.random.PRNGKey(0), jnp.asarray(x), mask)
    out = mod.apply(params, jnp.asarray(x), mask)
    # corrupt masked slots: output must be bitwise unchanged
    x2 = x.copy()
    x2[1, 2:] = 1e6
    out2 = mod.apply(params, jnp.asarray(x2), mask)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out2))
    # and masked rows genuinely differ from unmasked ones
    out3 = mod.apply(params, jnp.asarray(x),
                     jnp.asarray([[True] * 5, [True] * 5]))
    assert not np.allclose(np.asarray(out[1]), np.asarray(out3[1]))


def test_honet_forward():
    rng = np.random.default_rng(5)
    joined = _fake_joined(rng, q=4)
    enc = _enc_table(rng)
    net = HONet(input_dim=S, hidden_dim=H)
    params = net.init(jax.random.PRNGKey(0), enc, joined)
    out = net.apply(params, enc, joined)
    assert out.shape == (B,)


def test_embed_table_rewrite_equivalence():
    """table[e1] + table[e2] == MLP(enc[e1]) + MLP(enc[e2]): the unique-
    table join rewrite is exact (model.py:78 semantics)."""
    rng = np.random.default_rng(6)
    joined = _fake_joined(rng)
    enc = _enc_table(rng)
    from surel_plus_tpu.models.layers import MLP2
    mlp = MLP2(H, H)
    params = mlp.init(jax.random.PRNGKey(0), enc)
    table = mlp.apply(params, enc)
    fast = table[joined.eidx].sum(axis=-2)
    direct = mlp.apply(params, enc[joined.eidx]).sum(axis=-2)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(direct),
                               rtol=2e-5, atol=1e-6)
