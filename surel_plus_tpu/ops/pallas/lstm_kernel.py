"""Pallas TPU kernel: masked LSTM over set slots, final hidden state.

The LP+LSTM aggregator (models/layers.py LSTMAggregation, reference
model.py:63-65 == PyG LSTMAggregation) is a length-L=bucket sequential
recurrence. XLA's lax.scan version materializes per-step gates and
carries in HBM and underutilizes the MXU (measured 56k q/s inference at
L=301 — ~14x slower than the mean aggregator's path). This kernel keeps
the carries in VMEM/registers for the whole sequence and issues both
gate matmuls per step at the full program tile (128 rows), so the only
HBM traffic is one read of x and one [B, H] write.

Forward-only: training keeps the chunked-remat XLA scan (BPTT through a
Pallas recurrence would need in-kernel carry storage that exceeds VMEM
at production shapes). The wrapper is therefore not differentiable —
callers gate on an inference path (models/layers.py fast=...).

Gate order (i, f, g, o) matches torch nn.LSTM / the XLA path, so the
same wi/wh/bh parameters drive both implementations.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _lstm_kernel(ell, x_ref, mk_ref, wi_ref, wh_ref, bh_ref, out_ref):
    tb = x_ref.shape[0]
    hh = wh_ref.shape[0]
    wi = wi_ref[:]
    wh = wh_ref[:]
    bh = bh_ref[:]

    def step(t, carry):
        c, hid = carry
        xt = x_ref[:, pl.ds(t, 1), :].reshape(tb, wi.shape[0])
        gates = (jnp.dot(xt, wi, preferred_element_type=jnp.float32)
                 + jnp.dot(hid, wh, preferred_element_type=jnp.float32)
                 + bh)
        gi = jax.nn.sigmoid(gates[:, :hh])
        gf = jax.nn.sigmoid(gates[:, hh:2 * hh])
        gg = jnp.tanh(gates[:, 2 * hh:3 * hh])
        go = jax.nn.sigmoid(gates[:, 3 * hh:])
        nc = gf * c + gi * gg
        nh = go * jnp.tanh(nc)
        keep = mk_ref[:, pl.ds(t, 1)] > 0           # [tb, 1]
        return (jnp.where(keep, nc, c), jnp.where(keep, nh, hid))

    zero = jnp.zeros((tb, hh), jnp.float32)
    _, hid = jax.lax.fori_loop(0, ell, step, (zero, zero))
    out_ref[:] = hid


def _default_interpret() -> bool:
    return jax.default_backend() not in ("tpu",)


def lstm_final_hidden(x: jax.Array, mask: jax.Array, wi: jax.Array,
                      wh: jax.Array, bh: jax.Array, tb: int = 128,
                      interpret: bool | None = None) -> jax.Array:
    """Final masked-LSTM hidden state -> [B, H] float32 (forward only).

    x: [B, L, h] float (cast to f32 in-kernel via the matmul), mask:
    bool [B, L] (padded slots pass the carry through), wi: [h, 4H],
    wh: [H, 4H], bh: [4H]."""
    if interpret is None:
        interpret = _default_interpret()
    b, ell, _ = x.shape
    hh = wh.shape[0]
    tb = min(tb, max(8, b))
    bp = -(-b // tb) * tb
    mk = mask.astype(jnp.int32)
    if bp != b:
        x = jnp.pad(x, [(0, bp - b), (0, 0), (0, 0)])
        mk = jnp.pad(mk, [(0, bp - b), (0, 0)])
    blk = lambda shape, imap: pl.BlockSpec(shape, imap,
                                           memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_lstm_kernel, ell),
        grid=(bp // tb,),
        in_specs=[blk((tb, ell, x.shape[-1]), lambda i: (i, 0, 0)),
                  blk((tb, ell), lambda i: (i, 0)),
                  blk(wi.shape, lambda i: (0, 0)),
                  blk(wh.shape, lambda i: (0, 0)),
                  blk((1, bh.shape[-1]), lambda i: (0, 0))],
        out_specs=blk((tb, hh), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((bp, hh), jnp.float32),
        interpret=interpret,
    )(x.astype(jnp.float32), mk, wi.astype(jnp.float32),
      wh.astype(jnp.float32), bh.reshape(1, -1).astype(jnp.float32))
    return out[:b]
