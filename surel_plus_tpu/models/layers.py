"""Shared model layers: MLPs, MergeLayer, masked set aggregators.

Reference: model.py (Net / MergeLayer, PyG aggregations) and
model_horder.py. Aggregations operate on padded [B, L, h] tiles with
validity masks instead of PyG ptr/index segments — same math, static
shapes, batched matmuls on the MXU.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

Dtype = jnp.dtype

xavier_normal = nn.initializers.xavier_normal()


class MLP2(nn.Module):
    """Linear -> ReLU -> Linear, xavier-normal weights.

    The reference's `pe_embedding` / `feature_embedding`
    (model.py:54-57, model_horder.py:49-50). `dtype` selects the compute
    precision (bfloat16 on TPU: 4x MXU rate; params stay float32).
    """

    hidden_dim: int
    out_dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.hidden_dim, kernel_init=xavier_normal,
                     dtype=self.dtype)(x)
        x = nn.relu(x)
        return nn.Dense(self.out_dim, kernel_init=xavier_normal,
                        dtype=self.dtype)(x)


class MergeLayer(nn.Module):
    """Two-layer scorer over concatenated endpoint embeddings
    (model.py:7-42; the higher-order 4-input variant is model_horder.py:7-35
    — same computation on a wider concat)."""

    hidden_dim: int
    out_dim: int = 1
    dropout: float = 0.1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, xs, *, train: bool = False):
        x = jnp.concatenate(xs, axis=-1)
        h = nn.relu(nn.Dense(self.hidden_dim, kernel_init=xavier_normal,
                             dtype=self.dtype)(x))
        h = nn.Dropout(self.dropout, deterministic=not train)(h)
        # final scorer layer in float32 for a stable logit
        return nn.Dense(self.out_dim, kernel_init=xavier_normal)(
            h.astype(jnp.float32))


def masked_mean(x: jax.Array, mask: jax.Array) -> jax.Array:
    """Mean over the set axis (-2) honoring the mask.

    Equivalent to PyG MeanAggregation over ptr segments (model.py:67).
    Sets always contain the root, so sizes >= 1.
    """
    m = mask[..., None].astype(x.dtype)
    s = (x * m).sum(axis=-2)
    cnt = jnp.maximum(m.sum(axis=-2), 1.0)
    return s / cnt


class AttentionAggregation(nn.Module):
    """Gated attention pooling == PyG AttentionalAggregation with
    gate_nn = MLP([h, 1]) and fnn = MLP([h, h]) (model.py:59-62): softmax
    of a scalar gate over each set, weighted sum of transformed features."""

    hidden_dim: int

    @nn.compact
    def __call__(self, x: jax.Array, mask: jax.Array) -> jax.Array:
        gate = nn.Dense(1, kernel_init=xavier_normal)(x)  # [..., L, 1]
        gate = jnp.where(mask[..., None], gate, -jnp.inf)
        attn = jax.nn.softmax(gate, axis=-2)
        attn = jnp.where(mask[..., None], attn, 0.0)
        val = nn.Dense(self.hidden_dim, kernel_init=xavier_normal)(x)
        return (attn * val).sum(axis=-2)


class LSTMAggregation(nn.Module):
    """LSTM over each set's elements in ascending node-id order, final
    hidden state as the set embedding == PyG LSTMAggregation (model.py:63-65;
    element order there is CSR column order, which is also node-id order).

    Padded slots (mask False) leave the carry unchanged, so the final carry
    equals the hidden state after the last real element.
    """

    hidden_dim: int

    @nn.compact
    def __call__(self, x: jax.Array, mask: jax.Array) -> jax.Array:
        *batch_shape, L, h = x.shape
        xf = x.reshape((-1, L, h))
        mf = mask.reshape((-1, L))
        cell = nn.OptimizedLSTMCell(self.hidden_dim)
        carry0 = cell.initialize_carry(jax.random.PRNGKey(0),
                                       (xf.shape[0], h))

        def step(cell, carry, inp):
            xt, mt = inp
            new_carry, _ = cell(carry, xt)
            keep = mt[:, None]
            carry = jax.tree.map(
                lambda new, old: jnp.where(keep, new, old), new_carry, carry)
            return carry, None

        scan = nn.scan(step, variable_broadcast="params",
                       split_rngs={"params": False},
                       in_axes=1, out_axes=1)
        (c, hidden), _ = scan(cell, carry0, (xf, mf))
        return hidden.reshape((*batch_shape, self.hidden_dim))
