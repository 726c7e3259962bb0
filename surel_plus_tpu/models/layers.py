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

    `hidden` / `project` expose the two halves separately so callers can
    move set reductions BETWEEN them: sums and means commute with the
    second (linear) layer, so aggregating the relu activations first and
    projecting the [B, h] aggregate once avoids materializing the
    projected per-slot tensor entirely (models/net.py). Parameter names
    match the original compact layout (Dense_0 / Dense_1).
    """

    hidden_dim: int
    out_dim: int
    dtype: Dtype = jnp.float32

    def setup(self):
        self.fc0 = nn.Dense(self.hidden_dim, kernel_init=xavier_normal,
                            dtype=self.dtype, name="Dense_0")
        self.fc1 = nn.Dense(self.out_dim, kernel_init=xavier_normal,
                            dtype=self.dtype, name="Dense_1")

    def __call__(self, x):
        return self.fc1(nn.relu(self.fc0(x)))

    def hidden(self, x):
        """First layer + relu only."""
        return nn.relu(self.fc0(x))

    def hidden_raw(self, in_dim: int):
        """fc0's raw (kernel, bias) for fused kernels.

        Materializes the params (via a 1-row dummy call, so init and the
        parameter tree are identical to the standard path) and returns
        them uncast — callers pick the compute dtype.
        """
        _ = self.fc0(jnp.zeros((1, in_dim), self.dtype))
        p = self.fc0.variables["params"]
        return p["kernel"], p["bias"]

    def project(self, h):
        """Second (linear) layer only."""
        return self.fc1(h)

    def project_raw(self):
        """fc1's raw (kernel, bias) for algebraic folds (see
        hidden_raw for the parameter-tree-preserving dummy call)."""
        _ = self.fc1(jnp.zeros((1, self.hidden_dim), self.dtype))
        p = self.fc1.variables["params"]
        return p["kernel"], p["bias"]


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

    def setup(self):
        self.gate_nn = nn.Dense(1, kernel_init=xavier_normal,
                                name="Dense_0")
        self.value_nn = nn.Dense(self.hidden_dim,
                                 kernel_init=xavier_normal,
                                 name="Dense_1")

    def __call__(self, x: jax.Array, mask: jax.Array) -> jax.Array:
        gate = self.gate_nn(x)                            # [..., L, 1]
        gate = jnp.where(mask[..., None], gate, -jnp.inf)
        attn = jax.nn.softmax(gate, axis=-2)
        attn = jnp.where(mask[..., None], attn, 0.0)
        val = self.value_nn(x)
        return (attn * val).sum(axis=-2)

    def folded(self, hsum: jax.Array, mask: jax.Array, w2: jax.Array,
               c2: jax.Array) -> jax.Array:
        """Same pooling with the upstream projection (x = hsum @ w2 + c2)
        and the value Dense folded PAST the softmax: both are affine and
        the attention weights sum to 1 over each (never-empty) set, so

            sum_l a_l x_l == (sum_l a_l hsum_l) @ w2 + c2

        and the value Dense applies to that aggregate. Only the scalar
        gate touches per-slot data — no [..., L, h] tensor besides hsum
        is ever materialized. Same parameter tree as __call__."""
        h = hsum.shape[-1]
        _ = self.gate_nn(jnp.zeros((1, h), hsum.dtype))
        _ = self.value_nn(jnp.zeros((1, h), hsum.dtype))
        pg = self.gate_nn.variables["params"]
        gvec = w2.astype(hsum.dtype) @ pg["kernel"].astype(hsum.dtype)
        gconst = (c2 @ pg["kernel"].astype(c2.dtype)
                  + pg["bias"].astype(c2.dtype))
        gate = hsum @ gvec + gconst.astype(hsum.dtype)    # [..., L, 1]
        gate = jnp.where(mask[..., None], gate, -jnp.inf)
        attn = jax.nn.softmax(gate, axis=-2)
        attn = jnp.where(mask[..., None], attn, 0.0)
        pooled = (attn * hsum).sum(axis=-2)               # [..., h]
        x_agg = pooled @ w2.astype(pooled.dtype) + c2.astype(pooled.dtype)
        return self.value_nn(x_agg)

    def folded_from_keys(self, kown: jax.Array, kcross_al: jax.Array,
                         mask: jax.Array, u_ext: jax.Array, shift: int,
                         w2: jax.Array, c2: jax.Array, *,
                         root_own=None, root_cross=None,
                         chunk=None) -> jax.Array:
        """`folded` with the pooling fused all the way to the packed
        keys (ops/pallas/hidden_sum_kernel.py fused_attn_pool): the
        per-slot hidden rows live only in VMEM. Differentiable: the
        kernel carries a custom VJP (in-kernel softmax backward), so
        training uses this path un-gated — see models/net.py. chunk:
        slot-chunked execution for wide shapes (attn_pool_chunk)."""
        from surel_plus_tpu.ops.pallas.hidden_sum_kernel import (
            fused_attn_pool)

        h = w2.shape[0]
        _ = self.gate_nn(jnp.zeros((1, h), jnp.float32))
        _ = self.value_nn(jnp.zeros((1, h), jnp.float32))
        pg = self.gate_nn.variables["params"]
        w2f = w2.astype(jnp.float32)
        gvec = w2f @ pg["kernel"].astype(jnp.float32)     # [h, 1]
        gconst = c2 @ pg["kernel"].astype(c2.dtype) + pg["bias"]
        pooled = fused_attn_pool(kown, kcross_al, mask, u_ext, gvec,
                                 gconst, shift, root_own=root_own,
                                 root_cross=root_cross,
                                 chunk=chunk)             # [Q, B, h]
        x_agg = pooled @ w2f + c2
        return self.value_nn(x_agg)


class LSTMAggregation(nn.Module):
    """LSTM over each set's elements in ascending node-id order, final
    hidden state as the set embedding == PyG LSTMAggregation (model.py:63-65;
    element order there is CSR column order, which is also node-id order).

    Padded slots (mask False) leave the carry unchanged, so the final carry
    equals the hidden state after the last real element.

    TPU layout: all four input-gate projections for every step run as ONE
    batched [B*L, h] x [h, 4H] matmul hoisted out of the scan (the MXU
    does the heavy lifting once); the sequential part is only the small
    [B, H] x [H, 4H] hidden matmul + pointwise gates per step. Gate chunk
    order is (i, f, g, o) — torch nn.LSTM's stacking, so weights transfer
    directly (weight_ih = wi.T, weight_hh = wh.T, bias_hh = bh,
    bias_ih = 0).
    """

    hidden_dim: int
    unroll: int = 8
    # remat granularity: the scan over set slots checkpoints every `chunk`
    # steps, so backward stores carries only at chunk boundaries and
    # recomputes gates inside — without this, L=301 training stores every
    # per-step carry and OOMs HBM at production batch sizes (measured
    # 24.4 GB > 15.75 GB on v5e at bs=4096, hidden 96).
    chunk: int = 32
    # NOTE (r2 rewrite): the parameter tree is wi/wh/bh (not flax
    # OptimizedLSTMCell's), so lstm checkpoints from before commit
    # "keys-direct LSTM" cannot resume. Default init is xavier_normal /
    # zeros; set torch_init=True for torch nn.LSTM's uniform
    # U(-1/sqrt(H), 1/sqrt(H)) on all of wi/wh/bh — use that when
    # comparing Table-3 accuracy against the torch reference.
    torch_init: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, mask: jax.Array, *,
                 fast: bool = False, fold=None, keys=None) -> jax.Array:
        """fold=(w2, c2): x is the PRE-projection hsum and the affine
        upstream projection x' = x @ w2 + c2 folds into the input
        weights (wi' = w2 @ wi, bh' = bh + c2 @ wi) — the projected
        per-slot tensor never materializes. Same parameter tree.

        keys=(kown, kcross_al, mask, u_ext, shift, root_own,
        root_cross): run the recurrence DIRECTLY from the packed keys
        (ops/pallas/lstm_kernel.py lstm_from_keys) — x is then only a
        shape/param template and even the hidden rows stay in VMEM."""
        *batch_shape, L, h = x.shape
        H = self.hidden_dim
        xf = x.reshape((-1, L, h))
        mf = mask.reshape((-1, L))
        B = xf.shape[0]

        in_w = fold[0].shape[1] if fold is not None else h
        if self.torch_init:
            bound = float(H) ** -0.5

            def _uinit(key, shape, dtype=jnp.float32):
                return jax.random.uniform(key, shape, dtype,
                                          -bound, bound)

            w_init = b_init = _uinit
        else:
            w_init, b_init = xavier_normal, nn.initializers.zeros
        wi = self.param("wi", w_init, (in_w, 4 * H))
        wh = self.param("wh", w_init, (H, 4 * H))
        bh = self.param("bh", b_init, (4 * H,))
        if fold is not None:
            w2, c2 = fold
            wi_eff = w2.astype(xf.dtype) @ wi.astype(xf.dtype)
            bh_eff = (bh.astype(jnp.float32)
                      + (c2 @ wi.astype(c2.dtype)).reshape(-1))
        else:
            wi_eff, bh_eff = wi, bh.astype(jnp.float32)

        if fast and keys is not None:
            from surel_plus_tpu.ops.pallas.lstm_kernel import (
                lstm_from_keys)

            kown, kcross_al, kmask, u_ext, shift, ro, rc = keys
            hidden = lstm_from_keys(kown, kcross_al, kmask, u_ext,
                                    wi_eff, wh, bh_eff, shift,
                                    root_own=ro, root_cross=rc)
            return hidden.astype(x.dtype).reshape((*batch_shape, H))
        if fast:
            # VMEM-resident Pallas recurrence with in-kernel chunked
            # BPTT (ops/pallas/lstm_kernel.py); the scan below is the
            # XLA reference path
            from surel_plus_tpu.ops.pallas.lstm_kernel import (
                lstm_final_hidden)

            hidden = lstm_final_hidden(xf, mf, wi_eff, wh, bh_eff)
            return hidden.astype(x.dtype).reshape((*batch_shape, H))

        return self._scan(xf, mf, wi_eff, wh, bh_eff,
                          batch_shape, L, B)

    def _scan(self, xf, mf, wi, wh, bh, batch_shape, L, B):
        H = self.hidden_dim

        # the recurrence runs in f32 regardless of the input-projection
        # compute dtype (matches the Pallas kernels; also keeps the scan
        # carry dtype stable when a folded bf16 wi_eff meets the f32 wh)
        xproj = (xf @ wi).astype(jnp.float32)  # [B, L, 4H] one MXU matmul
        wh = wh.astype(jnp.float32)
        bh = bh.astype(jnp.float32)
        carry0 = (jnp.zeros((B, H), jnp.float32),
                  jnp.zeros((B, H), jnp.float32))

        def step(carry, inp):
            c, hid = carry
            xp, mt = inp
            gates = xp + hid @ wh + bh
            gi, gf, gg, go = jnp.split(gates, 4, axis=-1)
            new_c = jax.nn.sigmoid(gf) * c + (jax.nn.sigmoid(gi)
                                              * jnp.tanh(gg))
            new_h = jax.nn.sigmoid(go) * jnp.tanh(new_c)
            keep = mt[:, None]
            return (jnp.where(keep, new_c, c),
                    jnp.where(keep, new_h, hid)), None

        chunk = min(self.chunk, L)
        pad = (-L) % chunk
        xs_x = jnp.moveaxis(xproj, 1, 0)            # [L, B, 4H]
        xs_m = jnp.moveaxis(mf, 1, 0)               # [L, B]
        if pad:
            # padded slots are masked out -> carry passes through
            xs_x = jnp.concatenate(
                [xs_x, jnp.zeros((pad, B, 4 * H), xs_x.dtype)])
            xs_m = jnp.concatenate(
                [xs_m, jnp.zeros((pad, B), xs_m.dtype)])
        nchunks = (L + pad) // chunk
        xs_x = xs_x.reshape(nchunks, chunk, B, 4 * H)
        xs_m = xs_m.reshape(nchunks, chunk, B)

        @jax.checkpoint
        def chunk_body(carry, xs):
            return jax.lax.scan(step, carry, xs,
                                unroll=min(self.unroll, chunk))

        (c, hidden), _ = jax.lax.scan(chunk_body, carry0, (xs_x, xs_m))
        # match the fast paths' `hidden.astype(x.dtype)` output contract
        # (the recurrence itself runs f32 regardless)
        return hidden.reshape((*batch_shape, H)).astype(xf.dtype)
