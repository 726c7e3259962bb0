"""Pallas TPU kernel: masked LSTM over set slots, final hidden state.

The LP+LSTM aggregator (models/layers.py LSTMAggregation, reference
model.py:63-65 == PyG LSTMAggregation) is a length-L=bucket sequential
recurrence. XLA's lax.scan version materializes per-step gates and
carries in HBM and underutilizes the MXU (measured 56k q/s inference at
L=301 — ~14x slower than the mean aggregator's path). This kernel keeps
the carries in VMEM/registers for the whole sequence and issues both
gate matmuls per step at the full program tile (128 rows), so the only
HBM traffic is one read of x and one [B, H] write.

Differentiable via an in-kernel chunked-BPTT backward: the backward
kernel re-runs the forward storing only chunk-boundary carries in VMEM
scratch (nch x [TB, H] x 2), then walks chunks in reverse — recomputing
each chunk's per-step carries/gate activations into a [chunk, TB, *]
scratch and accumulating dW/db on the MXU — so, like the forward,
nothing per-step ever touches HBM except the dx output.

Gate order (i, f, g, o) matches torch nn.LSTM / the XLA path, so the
same wi/wh/bh parameters drive both implementations.
"""

from __future__ import annotations

import functools
import math
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _vmem_budget() -> int:
    """Per-grid-cell VMEM budget for auto-shrinking tile sizes. v5e has
    ~16 MB/core; leave headroom for the compiler's own temporaries."""
    return int(os.environ.get("SUREL_LSTM_VMEM_BUDGET",
                              12 * 2**20))


def _pad_ell(ell: int, tb: int, chunk: int) -> int:
    """Smallest ellp >= ell with (tb*ellp) % 128 == 0 and
    ellp % chunk == 0 (flat-key lane blocks + whole BPTT chunks)."""
    step = 128 // math.gcd(tb, 128)
    ellp = ell
    while ellp % step or ellp % chunk:
        ellp += 1
    return ellp


def _klstm_bwd_vmem(tb, ell, chunk, hd, hh, nbx, has_root) -> int:
    """f32/uint32 bytes resident per grid cell of _klstm_bwd_call:
    scratch + input blocks + outputs. VMEM tiles pad the LANE (minor)
    dim to 128, so the [.., hd+1] / [.., hh] scratch really occupies
    128-lane rows — count that, or the auto-shrink underestimates and
    the kernel OOMs on hardware."""
    lp = lambda n: -(-n // 128) * 128
    nch = ell // chunk
    hdp = hd + 1                            # + keep lane (_be2_of)
    scratch = (2 * tb * ell * lp(hdp)       # hs, dhs
               + 2 * nch * tb * lp(hh)      # boundary carries
               + 3 * chunk * tb * lp(hh)    # sc, shp, snc
               + chunk * tb * lp(4 * hh))   # sg
    keys = (5 if has_root else 3) * tb * ell    # + flat mask plane
    ops = ((nbx + 1) * lp(hdp) + hdp * lp(4 * hh) + hh * lp(4 * hh)
           + lp(4 * hh) + tb * lp(hh))
    outs = (nbx + 1) * lp(hdp) + hdp * lp(4 * hh) + hh * lp(4 * hh) \
        + lp(4 * hh)
    return 4 * (scratch + keys + ops + outs)


def _klstm_fwd_vmem(tb, ell, chunk, hd, hh, nbx, has_root) -> int:
    """Forward-kernel VMEM: only the hs scratch + operands (no dhs, no
    BPTT chunk scratch) — so the forward can run a much larger row tile
    than the backward (bigger recurrence matmuls, fewer grid cells)."""
    lp = lambda n: -(-n // 128) * 128
    hdp = hd + 1
    scratch = tb * ell * lp(hdp)
    keys = (5 if has_root else 3) * tb * ell
    ops = ((nbx + 1) * lp(hdp) + hdp * lp(4 * hh) + hh * lp(4 * hh)
           + lp(4 * hh))
    return 4 * (scratch + keys + ops + tb * lp(hh))


def _shrink_tiles(tb, chunk, ell, vmem_of):
    """Halve tb (floor 8), then chunk (floor 8), until vmem_of(tb,
    ellp(tb, chunk), chunk) fits the budget. Returns (tb, chunk)."""
    budget = _vmem_budget()
    while (vmem_of(tb, _pad_ell(ell, tb, chunk), chunk) > budget
           and tb > 8):
        tb //= 2
    while (vmem_of(tb, _pad_ell(ell, tb, chunk), chunk) > budget
           and chunk > 8):
        chunk //= 2
    return tb, chunk


def _lstm_kernel(ell, x_ref, wi_ref, wh_ref, bh_ref, out_ref):
    """x's LAST LANE is the slot-valid mask (fused by the caller; wi has
    a matching zero row). A separate [tb, ell] mask block would need a
    dynamic-LANE read per step — rejected by Mosaic on hardware (lane
    indices must be %128); the mask-as-lane read is a static width-1
    slice (legal, scripts/probe_mosaic_dyn.py)."""
    tb = x_ref.shape[0]
    hdp = x_ref.shape[2]
    hh = wh_ref.shape[0]
    wi = wi_ref[:]
    wh = wh_ref[:]
    bh = bh_ref[:]

    def step(t, carry):
        c, hid = carry
        xt = x_ref[:, pl.ds(t, 1), :].reshape(tb, hdp)
        gates = (jnp.dot(xt, wi, preferred_element_type=jnp.float32)
                 + jnp.dot(hid, wh, preferred_element_type=jnp.float32)
                 + bh)
        gi = jax.nn.sigmoid(gates[:, :hh])
        gf = jax.nn.sigmoid(gates[:, hh:2 * hh])
        gg = jnp.tanh(gates[:, 2 * hh:3 * hh])
        go = jax.nn.sigmoid(gates[:, 3 * hh:])
        nc = gf * c + gi * gg
        nh = go * jnp.tanh(nc)
        keep = xt[:, hdp - 1:hdp] > 0               # [tb, 1]
        return (jnp.where(keep, nc, c), jnp.where(keep, nh, hid))

    zero = jnp.zeros((tb, hh), jnp.float32)
    _, hid = jax.lax.fori_loop(0, ell, step, (zero, zero))
    out_ref[:] = hid


def _lstm_bwd_kernel(ell, chunk, x_ref, wi_ref, wh_ref, bh_ref,
                     g_ref, dx_ref, dwi_ref, dwh_ref, dbh_ref,
                     bc_ref, bhh_ref, sc_ref, shp_ref, sg_ref, snc_ref):
    pid = pl.program_id(0)
    tb = x_ref.shape[0]
    hd = wi_ref.shape[0]
    hh = wh_ref.shape[0]
    nch = ell // chunk
    wi = wi_ref[:]
    wh = wh_ref[:]
    bh = bh_ref[:]
    zero = jnp.zeros((tb, hh), jnp.float32)

    def gates_of(c, hid, t):
        xt = x_ref[:, pl.ds(t, 1), :].reshape(tb, hd)
        a = (jnp.dot(xt, wi, preferred_element_type=jnp.float32)
             + jnp.dot(hid, wh, preferred_element_type=jnp.float32) + bh)
        gi = jax.nn.sigmoid(a[:, :hh])
        gf = jax.nn.sigmoid(a[:, hh:2 * hh])
        gg = jnp.tanh(a[:, 2 * hh:3 * hh])
        go = jax.nn.sigmoid(a[:, 3 * hh:])
        nc = gf * c + gi * gg
        nh = go * jnp.tanh(nc)
        keep = xt[:, hd - 1:hd] > 0                  # mask lane [tb, 1]
        return gi, gf, gg, go, nc, nh, keep

    # phase 1: forward, storing only chunk-boundary carries
    def fstep(t, carry):
        c, hid = carry
        _, _, _, _, nc, nh, keep = gates_of(c, hid, t)
        return (jnp.where(keep, nc, c), jnp.where(keep, nh, hid))

    c = zero
    hid = zero
    for ci in range(nch):
        bc_ref[ci] = c
        bhh_ref[ci] = hid
        c, hid = jax.lax.fori_loop(ci * chunk, (ci + 1) * chunk, fstep,
                                   (c, hid))

    # phase 2: chunks in reverse — recompute per-step state into
    # scratch, then run BPTT over the chunk
    dh = g_ref[:]
    dc = zero
    dwi_a = jnp.zeros((hd, 4 * hh), jnp.float32)
    dwh_a = jnp.zeros((hh, 4 * hh), jnp.float32)
    dbh_a = jnp.zeros((1, 4 * hh), jnp.float32)
    for ci in reversed(range(nch)):
        def rstep(j, carry, ci=ci):
            c, hid = carry
            gi, gf, gg, go, nc, nh, keep = gates_of(c, hid,
                                                    ci * chunk + j)
            sc_ref[pl.ds(j, 1)] = c[None]
            shp_ref[pl.ds(j, 1)] = hid[None]
            sg_ref[pl.ds(j, 1)] = jnp.concatenate(
                [gi, gf, gg, go], axis=1)[None]
            snc_ref[pl.ds(j, 1)] = nc[None]
            return (jnp.where(keep, nc, c), jnp.where(keep, nh, hid))

        jax.lax.fori_loop(0, chunk, rstep,
                          (bc_ref[ci], bhh_ref[ci]))

        def bstep(jr, carry, ci=ci):
            dc, dh, dwi_a, dwh_a, dbh_a = carry
            j = chunk - 1 - jr
            t = ci * chunk + j
            cp = sc_ref[pl.ds(j, 1)].reshape(tb, hh)
            hp = shp_ref[pl.ds(j, 1)].reshape(tb, hh)
            gp = sg_ref[pl.ds(j, 1)].reshape(tb, 4 * hh)
            nc = snc_ref[pl.ds(j, 1)].reshape(tb, hh)
            xt = x_ref[:, pl.ds(t, 1), :].reshape(tb, hd)
            keep = xt[:, hd - 1:hd] > 0
            gi = gp[:, :hh]
            gf = gp[:, hh:2 * hh]
            gg = gp[:, 2 * hh:3 * hh]
            go = gp[:, 3 * hh:]
            tnc = jnp.tanh(nc)
            dgo = dh * tnc * go * (1.0 - go)
            dnc = dc + dh * go * (1.0 - tnc * tnc)
            dgi = dnc * gg * gi * (1.0 - gi)
            dgf = dnc * cp * gf * (1.0 - gf)
            dgg = dnc * gi * (1.0 - gg * gg)
            dgates = jnp.concatenate([dgi, dgf, dgg, dgo], axis=1)
            dgates = jnp.where(keep, dgates, 0.0)    # [tb, 4H]
            # contraction over rows (dim 0 both): x^T dgates etc.
            cdim = (((0,), (0,)), ((), ()))
            dwi_a += jax.lax.dot_general(
                xt, dgates, dimension_numbers=cdim,
                preferred_element_type=jnp.float32)
            dwh_a += jax.lax.dot_general(
                hp, dgates, dimension_numbers=cdim,
                preferred_element_type=jnp.float32)
            dbh_a += dgates.sum(axis=0, keepdims=True)
            # contraction over 4H (dim 1 both): dgates @ W^T
            cT = (((1,), (1,)), ((), ()))
            dx_ref[:, pl.ds(t, 1), :] = jax.lax.dot_general(
                dgates, wi, dimension_numbers=cT,
                preferred_element_type=jnp.float32)[:, None, :]
            dhp = jax.lax.dot_general(
                dgates, wh, dimension_numbers=cT,
                preferred_element_type=jnp.float32) \
                + jnp.where(keep, 0.0, dh)
            dcp = jnp.where(keep, dnc * gf, dc)
            return (dcp, dhp, dwi_a, dwh_a, dbh_a)

        dc, dh, dwi_a, dwh_a, dbh_a = jax.lax.fori_loop(
            0, chunk, bstep, (dc, dh, dwi_a, dwh_a, dbh_a))

    @pl.when(pid == 0)
    def _():
        dwi_ref[:] = jnp.zeros_like(dwi_ref)
        dwh_ref[:] = jnp.zeros_like(dwh_ref)
        dbh_ref[:] = jnp.zeros_like(dbh_ref)

    dwi_ref[:] += dwi_a
    dwh_ref[:] += dwh_a
    dbh_ref[:] += dbh_a


def _default_interpret() -> bool:
    return jax.default_backend() not in ("tpu",)


def _specs(tb, ell, hd, hh, blk):
    return [blk((tb, ell, hd), lambda i: (i, 0, 0)),
            blk((hd, 4 * hh), lambda i: (0, 0)),
            blk((hh, 4 * hh), lambda i: (0, 0)),
            blk((1, 4 * hh), lambda i: (0, 0))]


def _lstm_fwd_call(x, wi, wh, bh, tb, interpret):
    bp, ell, hd = x.shape
    hh = wh.shape[0]
    blk = lambda shape, imap: pl.BlockSpec(shape, imap,
                                           memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_lstm_kernel, ell),
        grid=(bp // tb,),
        in_specs=_specs(tb, ell, hd, hh, blk),
        out_specs=blk((tb, hh), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((bp, hh), jnp.float32),
        interpret=interpret,
    )(x, wi, wh, bh)


def _lstm_bwd_call(x, wi, wh, bh, g, tb, chunk, interpret):
    bp, ell, hd = x.shape
    hh = wh.shape[0]
    nch = ell // chunk
    blk = lambda shape, imap: pl.BlockSpec(shape, imap,
                                           memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_lstm_bwd_kernel, ell, chunk),
        grid=(bp // tb,),
        in_specs=_specs(tb, ell, hd, hh, blk)
        + [blk((tb, hh), lambda i: (i, 0))],
        out_specs=(blk((tb, ell, hd), lambda i: (i, 0, 0)),
                   blk((hd, 4 * hh), lambda i: (0, 0)),
                   blk((hh, 4 * hh), lambda i: (0, 0)),
                   blk((1, 4 * hh), lambda i: (0, 0))),
        out_shape=(jax.ShapeDtypeStruct((bp, ell, hd), jnp.float32),
                   jax.ShapeDtypeStruct((hd, 4 * hh), jnp.float32),
                   jax.ShapeDtypeStruct((hh, 4 * hh), jnp.float32),
                   jax.ShapeDtypeStruct((1, 4 * hh), jnp.float32)),
        scratch_shapes=[pltpu.VMEM((nch, tb, hh), jnp.float32),
                        pltpu.VMEM((nch, tb, hh), jnp.float32),
                        pltpu.VMEM((chunk, tb, hh), jnp.float32),
                        pltpu.VMEM((chunk, tb, hh), jnp.float32),
                        pltpu.VMEM((chunk, tb, 4 * hh), jnp.float32),
                        pltpu.VMEM((chunk, tb, hh), jnp.float32)],
        interpret=interpret,
    )(x, wi, wh, bh, g)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _lstm(x, wi, wh, bh, tb, chunk, interpret):
    return _lstm_fwd_call(x, wi, wh, bh, tb, interpret)


def _lstm_fwd(x, wi, wh, bh, tb, chunk, interpret):
    return (_lstm_fwd_call(x, wi, wh, bh, tb, interpret),
            (x, wi, wh, bh))


def _lstm_bwd(tb, chunk, interpret, res, g):
    x, wi, wh, bh = res
    dx, dwi, dwh, dbh = _lstm_bwd_call(x, wi, wh, bh,
                                       g.astype(jnp.float32), tb, chunk,
                                       interpret)
    return dx, dwi, dwh, dbh


_lstm.defvjp(_lstm_fwd, _lstm_bwd)


def lstm_final_hidden(x: jax.Array, mask: jax.Array, wi: jax.Array,
                      wh: jax.Array, bh: jax.Array, tb: int = 32,
                      chunk: int = 32,
                      interpret: bool | None = None) -> jax.Array:
    """Final masked-LSTM hidden state -> [B, H] float32.

    x: [B, L, h] float (compute runs in f32), mask: bool [B, L] (padded
    slots pass the carry through), wi: [h, 4H], wh: [H, 4H], bh: [4H].
    Differentiable wrt x/wi/wh/bh (in-kernel chunked BPTT)."""
    if interpret is None:
        interpret = _default_interpret()
    b, ell, hd = x.shape
    hh = wh.shape[0]
    tb = min(tb, max(8, b))
    chunk = min(chunk, ell)
    # same VMEM auto-shrink as lstm_from_keys (x-in + dx-out blocks are
    # the 2*tb*ell*(hd+1) term; nbx=0, no key operands)
    tb, chunk = _shrink_tiles(
        tb, chunk, ell,
        lambda t, e, c: _klstm_bwd_vmem(t, e, c, hd, hh, 0, False))
    bp = -(-b // tb) * tb
    ellp = -(-ell // chunk) * chunk
    # mask rides as x's LAST LANE (wi gets a matching zero row): the
    # only Mosaic-legal per-step keep read — see _lstm_kernel. Pad
    # rows/slots carry mask 0 => the recurrence passes them through.
    xp = jnp.concatenate(
        [x.astype(jnp.float32),
         mask.astype(jnp.float32)[..., None]], axis=-1)
    if bp != b or ellp != ell:
        xp = jnp.pad(xp, [(0, bp - b), (0, ellp - ell), (0, 0)])
    wi2 = jnp.pad(wi.astype(jnp.float32), [(0, 1), (0, 0)])
    out = _lstm(xp, wi2,
                wh.astype(jnp.float32),
                bh.reshape(1, -1).astype(jnp.float32), tb, chunk,
                interpret)
    return out[:b]


# ---------------------------------------------------------------------------
# Mega-fusion: LSTM directly from packed keys. The per-slot hidden rows
# hs = relu(f(kown) U) + relu(f(kcross) U) are computed into VMEM
# scratch (chunked over L) and the recurrence runs off that scratch; the
# backward extends the chunked BPTT to write per-step dhs into scratch
# and contract dU = fields^T dz in-kernel — so, unlike the hsum + fold
# pipeline, nothing [B, L, h]-sized ever reaches HBM in either
# direction. The projection fold (models/layers.py) rides the effective
# input weights wi_f = W2 @ wi and bias bh_f = bh + c2 @ wi.

def _be2_of(k_flat, root_flat, mk_f, u2, shift):
    """Extended fields operand [nbx+1, R]: the usual field rows plus the
    slot-valid mask as a final row. Contracted against the extended
    u2 = [[U, 0], [sel, 1]] this lands the mask value in the hidden
    row's LAST LANE — the only Mosaic-legal way to read a per-step keep
    flag inside the recurrence (dynamic-LANE loads of a [tb, ell] mask
    block are rejected on hardware: lane indices must be %128; the
    dynamic-SUBLANE read of the [tb, ell, hdp] scratch is legal —
    scripts/probe_mosaic_dyn.py)."""
    from surel_plus_tpu.ops.pallas.hidden_sum_kernel import _fields_ext

    r = k_flat.shape[0]
    be = _fields_ext(k_flat, jnp.zeros((r,), jnp.float32), shift,
                     u2.shape[0] - 3, root_flat)
    return jnp.concatenate([be, mk_f[None, :]], axis=0)


def _hs_into(hs_ref, ko_ref, kc_ref, ro_ref, rc_ref, mk_ref, u2, shift,
             ell, rchunk):
    """Fill hs_ref [tb, ell, hd+1] with the pair-summed hidden rows;
    lane hd carries 2x the slot-valid mask (relu'd from both sides).

    Key/mask refs are FLAT [1, tb*ell] lane vectors (row-major), so the
    work chunks over ROWS (contiguous flat slices) to bound z
    temporaries."""
    from surel_plus_tpu.ops.pallas.hidden_sum_kernel import _CONTRACT_BITS

    tb, _, hdp = hs_ref.shape
    for r0 in range(0, tb, rchunk):
        rc_n = min(rchunk, tb - r0)
        sl = slice(r0 * ell, (r0 + rc_n) * ell)
        mkv = mk_ref[0, sl].astype(jnp.float32)
        ro = None if ro_ref is None else ro_ref[0, sl]
        rr = None if rc_ref is None else rc_ref[0, sl]
        zo = jax.lax.dot_general(
            _be2_of(ko_ref[0, sl], ro, mkv, u2, shift), u2,
            dimension_numbers=_CONTRACT_BITS,
            preferred_element_type=jnp.float32)
        zc = jax.lax.dot_general(
            _be2_of(kc_ref[0, sl], rr, mkv, u2, shift), u2,
            dimension_numbers=_CONTRACT_BITS,
            preferred_element_type=jnp.float32)
        hs = jnp.maximum(zo, 0.0) + jnp.maximum(zc, 0.0)
        hs_ref[r0:r0 + rc_n] = hs.reshape(rc_n, ell, hdp)


def _du_from_dhs(ko_ref, kc_ref, ro_ref, rc_ref, mk_ref, dhs_ref, u2,
                 shift, ell, rchunk):
    """dU2 = sum over slots of be2^T ((z > 0) * dhs), both sides.
    The mask row/column of dU2 is sliced away by the caller-side pad
    VJP (lstm_from_keys builds u2 with jnp.pad, so JAX undoes it)."""
    from surel_plus_tpu.ops.pallas.hidden_sum_kernel import _CONTRACT_BITS

    tb = dhs_ref.shape[0]
    acc = jnp.zeros(u2.shape, jnp.float32)
    for r0 in range(0, tb, rchunk):
        rc_n = min(rchunk, tb - r0)
        sl = slice(r0 * ell, (r0 + rc_n) * ell)
        dhs = dhs_ref[r0:r0 + rc_n].reshape(rc_n * ell, u2.shape[1])
        mkv = mk_ref[0, sl].astype(jnp.float32)
        for k_ref, r_ref in ((ko_ref, ro_ref), (kc_ref, rc_ref)):
            r = None if r_ref is None else r_ref[0, sl]
            be2 = _be2_of(k_ref[0, sl], r, mkv, u2, shift)
            z = jax.lax.dot_general(
                be2, u2, dimension_numbers=_CONTRACT_BITS,
                preferred_element_type=jnp.float32)
            dz = jnp.where(z > 0, dhs, 0.0)
            acc += jnp.dot(be2, dz, preferred_element_type=jnp.float32)
    return acc


_ZCHUNK = 8   # rows per hidden-recompute chunk


def _klstm_fwd_kernel(ell, shift, has_root, *refs):
    if has_root:
        (ko_ref, kc_ref, ro_ref, rc_ref, mk_ref, u_ref, wi_ref, wh_ref,
         bh_ref, out_ref, hs_ref) = refs
    else:
        (ko_ref, kc_ref, mk_ref, u_ref, wi_ref, wh_ref, bh_ref,
         out_ref, hs_ref) = refs
        ro_ref = rc_ref = None
    tb, _, hdp = hs_ref.shape
    hh = wh_ref.shape[0]
    u = u_ref[:]
    wi = wi_ref[:]
    wh = wh_ref[:]
    bh = bh_ref[:]
    _hs_into(hs_ref, ko_ref, kc_ref, ro_ref, rc_ref, mk_ref, u, shift,
             ell, _ZCHUNK)

    def step(t, carry):
        c, hid = carry
        xt = hs_ref[:, pl.ds(t, 1), :].reshape(tb, hdp)
        gates = (jnp.dot(xt, wi, preferred_element_type=jnp.float32)
                 + jnp.dot(hid, wh, preferred_element_type=jnp.float32)
                 + bh)
        gi = jax.nn.sigmoid(gates[:, :hh])
        gf = jax.nn.sigmoid(gates[:, hh:2 * hh])
        gg = jnp.tanh(gates[:, 2 * hh:3 * hh])
        go = jax.nn.sigmoid(gates[:, 3 * hh:])
        nc = gf * c + gi * gg
        nh = go * jnp.tanh(nc)
        keep = xt[:, hdp - 1:hdp] > 0
        return (jnp.where(keep, nc, c), jnp.where(keep, nh, hid))

    zero = jnp.zeros((tb, hh), jnp.float32)
    _, hid = jax.lax.fori_loop(0, ell, step, (zero, zero))
    out_ref[:] = hid


def _klstm_bwd_kernel(ell, chunk, shift, has_root, *refs):
    if has_root:
        (ko_ref, kc_ref, ro_ref, rc_ref, mk_ref, u_ref, wi_ref, wh_ref,
         bh_ref, g_ref, du_ref, dwi_ref, dwh_ref, dbh_ref,
         hs_ref, dhs_ref, bc_ref, bhh_ref, sc_ref, shp_ref, sg_ref,
         snc_ref) = refs
    else:
        (ko_ref, kc_ref, mk_ref, u_ref, wi_ref, wh_ref, bh_ref, g_ref,
         du_ref, dwi_ref, dwh_ref, dbh_ref,
         hs_ref, dhs_ref, bc_ref, bhh_ref, sc_ref, shp_ref, sg_ref,
         snc_ref) = refs
        ro_ref = rc_ref = None
    pid = pl.program_id(0)
    tb, _, hdp = hs_ref.shape
    hd = wi_ref.shape[0]
    hh = wh_ref.shape[0]
    nch = ell // chunk
    u = u_ref[:]
    wi = wi_ref[:]
    wh = wh_ref[:]
    bh = bh_ref[:]
    zero = jnp.zeros((tb, hh), jnp.float32)
    _hs_into(hs_ref, ko_ref, kc_ref, ro_ref, rc_ref, mk_ref, u, shift,
             ell, _ZCHUNK)

    def gates_of(c, hid, t):
        xt = hs_ref[:, pl.ds(t, 1), :].reshape(tb, hd)
        a = (jnp.dot(xt, wi, preferred_element_type=jnp.float32)
             + jnp.dot(hid, wh, preferred_element_type=jnp.float32) + bh)
        gi = jax.nn.sigmoid(a[:, :hh])
        gf = jax.nn.sigmoid(a[:, hh:2 * hh])
        gg = jnp.tanh(a[:, 2 * hh:3 * hh])
        go = jax.nn.sigmoid(a[:, 3 * hh:])
        nc = gf * c + gi * gg
        nh = go * jnp.tanh(nc)
        keep = xt[:, hdp - 1:hdp] > 0
        return gi, gf, gg, go, nc, nh, keep

    def fstep(t, carry):
        c, hid = carry
        _, _, _, _, nc, nh, keep = gates_of(c, hid, t)
        return (jnp.where(keep, nc, c), jnp.where(keep, nh, hid))

    c = zero
    hid = zero
    for ci in range(nch):
        bc_ref[ci] = c
        bhh_ref[ci] = hid
        c, hid = jax.lax.fori_loop(ci * chunk, (ci + 1) * chunk, fstep,
                                   (c, hid))

    dh = g_ref[:]
    dc = zero
    dwi_a = jnp.zeros((hd, 4 * hh), jnp.float32)
    dwh_a = jnp.zeros((hh, 4 * hh), jnp.float32)
    dbh_a = jnp.zeros((1, 4 * hh), jnp.float32)
    for ci in reversed(range(nch)):
        def rstep(j, carry, ci=ci):
            c, hid = carry
            gi, gf, gg, go, nc, nh, keep = gates_of(c, hid,
                                                    ci * chunk + j)
            sc_ref[pl.ds(j, 1)] = c[None]
            shp_ref[pl.ds(j, 1)] = hid[None]
            sg_ref[pl.ds(j, 1)] = jnp.concatenate(
                [gi, gf, gg, go], axis=1)[None]
            snc_ref[pl.ds(j, 1)] = nc[None]
            return (jnp.where(keep, nc, c), jnp.where(keep, nh, hid))

        jax.lax.fori_loop(0, chunk, rstep, (bc_ref[ci], bhh_ref[ci]))

        def bstep(jr, carry, ci=ci):
            dc, dh, dwi_a, dwh_a, dbh_a = carry
            j = chunk - 1 - jr
            t = ci * chunk + j
            cp = sc_ref[pl.ds(j, 1)].reshape(tb, hh)
            hp = shp_ref[pl.ds(j, 1)].reshape(tb, hh)
            gp = sg_ref[pl.ds(j, 1)].reshape(tb, 4 * hh)
            nc = snc_ref[pl.ds(j, 1)].reshape(tb, hh)
            xt = hs_ref[:, pl.ds(t, 1), :].reshape(tb, hd)
            keep = xt[:, hdp - 1:hdp] > 0
            gi = gp[:, :hh]
            gf = gp[:, hh:2 * hh]
            gg = gp[:, 2 * hh:3 * hh]
            go = gp[:, 3 * hh:]
            tnc = jnp.tanh(nc)
            dgo = dh * tnc * go * (1.0 - go)
            dnc = dc + dh * go * (1.0 - tnc * tnc)
            dgi = dnc * gg * gi * (1.0 - gi)
            dgf = dnc * cp * gf * (1.0 - gf)
            dgg = dnc * gi * (1.0 - gg * gg)
            dgates = jnp.concatenate([dgi, dgf, dgg, dgo], axis=1)
            dgates = jnp.where(keep, dgates, 0.0)
            cdim = (((0,), (0,)), ((), ()))
            dwi_a += jax.lax.dot_general(
                xt, dgates, dimension_numbers=cdim,
                preferred_element_type=jnp.float32)
            dwh_a += jax.lax.dot_general(
                hp, dgates, dimension_numbers=cdim,
                preferred_element_type=jnp.float32)
            dbh_a += dgates.sum(axis=0, keepdims=True)
            cT = (((1,), (1,)), ((), ()))
            dhs_ref[:, pl.ds(t, 1), :] = jax.lax.dot_general(
                dgates, wi, dimension_numbers=cT,
                preferred_element_type=jnp.float32)[:, None, :]
            dhp = jax.lax.dot_general(
                dgates, wh, dimension_numbers=cT,
                preferred_element_type=jnp.float32) \
                + jnp.where(keep, 0.0, dh)
            dcp = jnp.where(keep, dnc * gf, dc)
            return (dcp, dhp, dwi_a, dwh_a, dbh_a)

        dc, dh, dwi_a, dwh_a, dbh_a = jax.lax.fori_loop(
            0, chunk, bstep, (dc, dh, dwi_a, dwh_a, dbh_a))

    du_a = _du_from_dhs(ko_ref, kc_ref, ro_ref, rc_ref, mk_ref, dhs_ref,
                        u, shift, ell, _ZCHUNK)

    @pl.when(pid == 0)
    def _():
        du_ref[:] = jnp.zeros_like(du_ref)
        dwi_ref[:] = jnp.zeros_like(dwi_ref)
        dwh_ref[:] = jnp.zeros_like(dwh_ref)
        dbh_ref[:] = jnp.zeros_like(dbh_ref)

    du_ref[:] += du_a
    dwi_ref[:] += dwi_a
    dwh_ref[:] += dwh_a
    dbh_ref[:] += dbh_a


def _klstm_specs(tb, ell, nbx, hd, hh, has_root):
    blk = lambda shape, imap: pl.BlockSpec(shape, imap,
                                           memory_space=pltpu.VMEM)
    ins = [blk((1, tb * ell), lambda i: (0, i)),
           blk((1, tb * ell), lambda i: (0, i))]
    if has_root:
        ins += [blk((1, tb * ell), lambda i: (0, i)),
                blk((1, tb * ell), lambda i: (0, i))]
    # mask rides as a flat lane vector like the keys (a [tb, ell] block
    # would need dynamic-LANE reads in the recurrence — illegal on TPU)
    ins += [blk((1, tb * ell), lambda i: (0, i)),
            blk((nbx, hd), lambda i: (0, 0)),
            blk((hd, 4 * hh), lambda i: (0, 0)),
            blk((hh, 4 * hh), lambda i: (0, 0)),
            blk((1, 4 * hh), lambda i: (0, 0))]
    return ins, blk


def _klstm_fwd_call(ko, kc, roots, mk, u, wi, wh, bh, tb, ell, shift,
                    interpret):
    b2 = mk.shape[1] // ell
    nbx, hd = u.shape
    hh = wh.shape[0]
    ins, blk = _klstm_specs(tb, ell, nbx, hd, hh, roots is not None)
    args = (ko, kc) + (roots or ()) + (mk, u, wi, wh, bh)
    return pl.pallas_call(
        functools.partial(_klstm_fwd_kernel, ell, shift,
                          roots is not None),
        grid=(b2 // tb,),
        in_specs=ins,
        out_specs=blk((tb, hh), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((b2, hh), jnp.float32),
        scratch_shapes=[pltpu.VMEM((tb, ell, hd), jnp.float32)],
        interpret=interpret,
    )(*args)


def _klstm_bwd_call(ko, kc, roots, mk, u, wi, wh, bh, g, tb, ell,
                    chunk, shift, interpret):
    b2 = mk.shape[1] // ell
    nbx, hd = u.shape
    hh = wh.shape[0]
    nch = ell // chunk
    ins, blk = _klstm_specs(tb, ell, nbx, hd, hh, roots is not None)
    args = (ko, kc) + (roots or ()) + (mk, u, wi, wh, bh, g)
    return pl.pallas_call(
        functools.partial(_klstm_bwd_kernel, ell, chunk, shift,
                          roots is not None),
        grid=(b2 // tb,),
        in_specs=ins + [blk((tb, hh), lambda i: (i, 0))],
        out_specs=(blk((nbx, hd), lambda i: (0, 0)),
                   blk((hd, 4 * hh), lambda i: (0, 0)),
                   blk((hh, 4 * hh), lambda i: (0, 0)),
                   blk((1, 4 * hh), lambda i: (0, 0))),
        out_shape=(jax.ShapeDtypeStruct((nbx, hd), jnp.float32),
                   jax.ShapeDtypeStruct((hd, 4 * hh), jnp.float32),
                   jax.ShapeDtypeStruct((hh, 4 * hh), jnp.float32),
                   jax.ShapeDtypeStruct((1, 4 * hh), jnp.float32)),
        scratch_shapes=[pltpu.VMEM((tb, ell, hd), jnp.float32),
                        pltpu.VMEM((tb, ell, hd), jnp.float32),
                        pltpu.VMEM((nch, tb, hh), jnp.float32),
                        pltpu.VMEM((nch, tb, hh), jnp.float32),
                        pltpu.VMEM((chunk, tb, hh), jnp.float32),
                        pltpu.VMEM((chunk, tb, hh), jnp.float32),
                        pltpu.VMEM((chunk, tb, 4 * hh), jnp.float32),
                        pltpu.VMEM((chunk, tb, hh), jnp.float32)],
        interpret=interpret,
    )(*args)


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9, 10, 11, 12, 13))
def _klstm(ko, kc, roots, mk, u, wi, wh, bh, tbf, tb, ell, chunk, shift,
           interpret):
    # tbf: forward row tile (only the hs scratch is resident — can be
    # much larger than the backward's tb, cutting grid cells and growing
    # the serial recurrence's matmul rows)
    return _klstm_fwd_call(ko, kc, roots, mk, u, wi, wh, bh, tbf, ell,
                           shift, interpret)


def _klstm_fwd(ko, kc, roots, mk, u, wi, wh, bh, tbf, tb, ell, chunk,
               shift, interpret):
    return (_klstm_fwd_call(ko, kc, roots, mk, u, wi, wh, bh, tbf, ell,
                            shift, interpret),
            (ko, kc, roots, mk, u, wi, wh, bh))


def _klstm_bwd(tbf, tb, ell, chunk, shift, interpret, res, g):
    ko, kc, roots, mk, u, wi, wh, bh = res
    du, dwi, dwh, dbh = _klstm_bwd_call(
        ko, kc, roots, mk, u, wi, wh, bh, g.astype(jnp.float32), tb,
        ell, chunk, shift, interpret)
    f0 = lambda a: np.zeros(a.shape, jax.dtypes.float0)
    rz = None if roots is None else tuple(f0(r) for r in roots)
    return f0(ko), f0(kc), rz, f0(mk), du, dwi, dwh, dbh


_klstm.defvjp(_klstm_fwd, _klstm_bwd)


def lstm_from_keys(kown: jax.Array, kcross_al: jax.Array,
                   mask: jax.Array, u_ext: jax.Array, wi: jax.Array,
                   wh: jax.Array, bh: jax.Array, shift: int,
                   root_own: jax.Array | None = None,
                   root_cross: jax.Array | None = None,
                   tb: int = 32, chunk: int = 32,
                   interpret: bool | None = None) -> jax.Array:
    """Masked LSTM final hidden directly from packed keys -> [Q, B, H].

    kown/kcross_al: uint32 [Q, B, L] slot-aligned; mask bool [Q, B, L];
    u_ext as in fused_key_hidden_sum (hidden rows = relu both sides
    summed); wi [h, 4H] (projection-folded input weights), wh [H, 4H],
    bh [4H]. Differentiable wrt u_ext/wi/wh/bh; the per-slot hidden rows
    exist only in VMEM in both directions."""
    if interpret is None:
        interpret = _default_interpret()
    q, b, ell = kown.shape
    hh = wh.shape[0]
    nbx, hd = u_ext.shape
    b2 = q * b
    tb = min(tb, max(8, b2))
    chunk = min(chunk, ell)
    # auto-shrink tiles so each kernel's VMEM residency fits the chip.
    # The backward holds hs+dhs+BPTT chunk scratch (tb=16 at L=301->320,
    # h=H=96); the forward holds only hs, so it runs a larger tile (64).
    has_root = root_own is not None
    tb, chunk = _shrink_tiles(
        tb, chunk, ell,
        lambda t, e, c: _klstm_bwd_vmem(t, e, c, hd, hh, nbx, has_root))
    tbf, _ = _shrink_tiles(
        max(tb, min(64, max(8, b2))), chunk, ell,
        lambda t, e, c: _klstm_fwd_vmem(t, e, c, hd, hh, nbx, has_root))
    tbf = max(tbf, tb)
    bp = -(-b2 // max(tb, tbf)) * max(tb, tbf)
    # flat key blocks need (tb*ellp) % 128 == 0 for BOTH tiles (the
    # smaller tile's constraint is the binding one since tiles are
    # powers of two) AND ellp % chunk == 0
    ellp = _pad_ell(ell, min(tb, tbf), chunk)

    def prep(a, fill=0):
        a = a.reshape(b2, ell)
        pads = [(0, bp - b2), (0, ellp - ell)]
        if bp != b2 or ellp != ell:
            a = jnp.pad(a, pads, constant_values=fill)
        return a

    ko = prep(kown).reshape(1, bp * ellp)
    kc = prep(kcross_al).reshape(1, bp * ellp)
    mk = prep(mask.astype(jnp.int32)).reshape(1, bp * ellp)
    roots = None
    if root_own is not None:
        roots = (prep(root_own.astype(jnp.int32)).reshape(1, bp * ellp),
                 prep(root_cross.astype(jnp.int32)).reshape(1, bp * ellp))
    # Extended operands: u2 = [[U, 0], [0, 1]] lands the slot-valid mask
    # in the hidden rows' last lane (see _be2_of); wi2's matching zero
    # row keeps the gate matmuls exact. jnp.pad's VJP slices dU/dwi back
    # to the original shapes.
    u2 = jnp.pad(u_ext.astype(jnp.float32), [(0, 1), (0, 1)])
    u2 = u2.at[nbx, hd].set(1.0)
    wi2 = jnp.pad(wi.astype(jnp.float32), [(0, 1), (0, 0)])
    out = _klstm(ko, kc, roots, mk, u2, wi2,
                 wh.astype(jnp.float32),
                 bh.reshape(1, -1).astype(jnp.float32), tbf, tb, ellp,
                 chunk, shift, interpret)
    return out[:b2].reshape(q, b, hh)
