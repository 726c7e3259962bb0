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
    """f32/uint32 bytes resident per grid cell of the x-based _lstm_bwd_call:
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
# Mega-fusion: LSTM directly from packed keys, TRANSPOSED layout.
#
# The key planes arrive as [ellp, bp] — set SLOTS on sublanes, set rows
# on LANES — so every per-step access (keys, roots, mask) is a
# dynamic-SUBLANE slice, which Mosaic allows (dynamic-LANE loads are
# rejected on hardware; scripts/probe_mosaic_dyn.py). That makes the
# per-slot hidden rows
#     xt = relu(f(kown_t) U) + relu(f(kcross_t) U)          [tb, hdp]
# recomputable ON EVERY STEP from two [nbx, tb] x [nbx, hdp] MXU
# contractions (~2% of the step's gate-matmul FLOPs), which deletes the
# first-generation kernel's full-sequence hs/dhs VMEM scratch — the
# buffers whose 2*tb*ell*128 f32 footprint forced its backward down to
# a tb=16 row tile (measured 12.1k q/s train on TPU v5e vs the XLA
# scan's 15.6k; scripts/probe_fused_ab.py). With nothing sequence-sized
# resident, the row tile is the full 128-lane width: every gate matmul
# runs [128, hdp] x [hdp, 4H], and the backward stores only
# chunk-boundary carries plus per-chunk (c_prev, h_prev) planes — the
# gate activations are recomputed inside the reverse walk from those.
#
# The slot-valid mask still rides the extended operands (u2 =
# [[U, 0], [0, 1]] lands it in the hidden rows' last LANE; keep =
# xt[:, -1:] > 0) because a [1, tb] mask row cannot become the [tb, 1]
# gate-shaped flag in-kernel (lane<->sublane relayout, unsupported).

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


def _klstm_t_vmem(tb, ell, chunk, hdp, hh, nbx1, has_root) -> int:
    """f32/int32 bytes resident per grid cell of the transposed
    backward: chunk scratch + key planes + operands + grad outputs.
    Lane (minor) dims pad to 128 — count that or the chunk picker
    overestimates what fits."""
    lp = lambda n: -(-n // 128) * 128
    ellp = -(-ell // chunk) * chunk
    nch = ellp // chunk
    scratch = 2 * (nch + chunk) * tb * lp(hh)   # bc/bhh + sc/shp
    keys = (5 if has_root else 3) * ellp * lp(tb)
    ops = (nbx1 * lp(hdp) + hdp * lp(4 * hh) + hh * lp(4 * hh)
           + lp(4 * hh) + tb * lp(hh))
    outs = nbx1 * lp(hdp) + hdp * lp(4 * hh) + hh * lp(4 * hh) \
        + lp(4 * hh)
    return 4 * (scratch + keys + ops + outs)


def _pick_tiles(b2, ell, hd, hh, nbx, has_root, tb=None, tb_bwd=None,
                chunk=None):
    """Resolve (tb, tb_bwd, chunk, ellp) for the transposed keys-LSTM
    kernels (see lstm_from_keys for the policy rationale). Pure
    function of the shape — pinned by tests/test_pallas_hidden_sum."""
    if b2 < 128:
        tb = tb_bwd = b2
    else:
        bcap = -(-b2 // 128) * 128
        if tb_bwd is None:
            tb_bwd = 128
            for cand in (256,):
                if cand <= bcap and any(
                        _klstm_t_vmem(cand, ell, ch, hd + 1, hh,
                                      nbx + 1, has_root)
                        <= _vmem_budget() for ch in (64, 32, 16, 8)):
                    tb_bwd = cand
        if tb_bwd % 128 != 0 or tb_bwd > bcap:
            tb_bwd = 128
    if chunk is None:
        chunk = _pick_chunk(ell, tb_bwd, hd + 1, hh, nbx + 1, has_root)
    chunk = min(chunk, max(8, ell))
    ellp = -(-ell // chunk) * chunk
    if b2 >= 128:
        bcap = -(-b2 // 128) * 128
        if tb is None:
            # widest forward tile whose double-buffered plane set fits
            tb = 128
            for cand in (512, 256):
                if (cand <= bcap
                        and _klstm_t_fwd_vmem(cand, ellp, hh, nbx + 1,
                                              hd + 1, has_root)
                        <= _vmem_budget()):
                    tb = cand
                    break
        elif tb % 128 != 0:
            tb = 128
        tb = min(tb, bcap)
        if tb % tb_bwd != 0:
            tb_bwd = 128 if tb % 128 == 0 else tb
    return tb, tb_bwd, chunk, ellp


def _klstm_t_fwd_vmem(tb, ellp, hh, nbx1, hdp, has_root) -> int:
    """f32/int32 bytes resident per grid cell of the transposed
    FORWARD: Pallas double-buffers the pipelined key-plane blocks (the
    observed M=200 has_root tb=512 allocation is 16.25 MB ~= 2 x 5
    planes x 832 x 512 x 4B), plus operands and the output block."""
    lp = lambda n: -(-n // 128) * 128
    nplanes = 5 if has_root else 3
    planes = 2 * nplanes * ellp * lp(tb)
    ops = (nbx1 * lp(hdp) + hdp * lp(4 * hh) + hh * lp(4 * hh)
           + lp(4 * hh))
    out = 2 * tb * lp(hh)
    return 4 * (planes + ops + out)


def _pick_chunk(ell, tb, hdp, hh, nbx1, has_root) -> int:
    """Largest power-of-two BPTT chunk fitting the VMEM budget. The
    footprint is U-shaped in chunk (boundary carries ~ell/chunk, chunk
    scratch ~chunk), so probe candidates instead of halving."""
    budget = _vmem_budget()
    for cand in (64, 32, 16, 8):
        if _klstm_t_vmem(tb, ell, cand, hdp, hh, nbx1,
                         has_root) <= budget:
            return cand
    return 8


def _kt_z(ko_ref, kc_ref, ro_ref, rc_ref, mk_ref, u2, shift, t):
    """Recompute step t's pre-relu hidden rows from the transposed key
    planes: ((be_own, z_own), (be_cross, z_cross)), be [nbx, tb],
    z [tb, hdp]. Lane hdp-1 of z carries the slot-valid mask (via the
    mask row of be2 and u2's unit column)."""
    from surel_plus_tpu.ops.pallas.hidden_sum_kernel import (
        _CONTRACT_BITS)

    tb = ko_ref.shape[1]
    mkv = mk_ref[pl.ds(t, 1), :].reshape(tb).astype(jnp.float32)

    def side(k_ref, r_ref):
        kv = k_ref[pl.ds(t, 1), :].reshape(tb)
        rv = (None if r_ref is None
              else r_ref[pl.ds(t, 1), :].reshape(tb))
        be = _be2_of(kv, rv, mkv, u2, shift)
        z = jax.lax.dot_general(
            be, u2, dimension_numbers=_CONTRACT_BITS,
            preferred_element_type=jnp.float32)
        return be, z

    return side(ko_ref, ro_ref), side(kc_ref, rc_ref)


def _klstm_t_fwd_kernel(ell, shift, has_root, waves, *refs):
    if has_root:
        (ko_ref, kc_ref, ro_ref, rc_ref, mk_ref, u_ref, wi_ref, wh_ref,
         bh_ref, out_ref) = refs
    else:
        (ko_ref, kc_ref, mk_ref, u_ref, wi_ref, wh_ref, bh_ref,
         out_ref) = refs
        ro_ref = rc_ref = None
    tb = ko_ref.shape[1]
    hh = wh_ref.shape[0]
    hdp = u_ref.shape[1]
    u2 = u_ref[:]
    wi = wi_ref[:]
    wh = wh_ref[:]
    bh = bh_ref[:]
    tbw = tb // waves

    def step(t, carry):
        # `waves` independent sub-block chains per step: each wave's
        # gate matmul depends only on ITS OWN previous-step hidden, so
        # the scheduler can overlap wave k's MXU matmul with wave k-1's
        # VPU gate chain — the batch-wave pipelining of VERDICT r4
        # item 2. waves=1 reproduces the original single-chain body.
        (_, zo), (_, zc) = _kt_z(ko_ref, kc_ref, ro_ref, rc_ref, mk_ref,
                                 u2, shift, t)
        xt = jnp.maximum(zo, 0.0) + jnp.maximum(zc, 0.0)
        new = []
        for k in range(waves):
            c, hid = carry[k]
            xk = xt[k * tbw:(k + 1) * tbw]
            gates = (jnp.dot(xk, wi, preferred_element_type=jnp.float32)
                     + jnp.dot(hid, wh,
                               preferred_element_type=jnp.float32)
                     + bh)
            gi = jax.nn.sigmoid(gates[:, :hh])
            gf = jax.nn.sigmoid(gates[:, hh:2 * hh])
            gg = jnp.tanh(gates[:, 2 * hh:3 * hh])
            go = jax.nn.sigmoid(gates[:, 3 * hh:])
            nc = gf * c + gi * gg
            nh = go * jnp.tanh(nc)
            keep = xk[:, hdp - 1:hdp] > 0
            new.append((jnp.where(keep, nc, c),
                        jnp.where(keep, nh, hid)))
        return tuple(new)

    zero = jnp.zeros((tbw, hh), jnp.float32)
    out = jax.lax.fori_loop(0, ell, step,
                            tuple((zero, zero) for _ in range(waves)))
    for k in range(waves):
        out_ref[k * tbw:(k + 1) * tbw] = out[k][1]


def _klstm_t_bwd_kernel(ell, chunk, shift, has_root, waves, *refs):
    if has_root:
        (ko_ref, kc_ref, ro_ref, rc_ref, mk_ref, u_ref, wi_ref, wh_ref,
         bh_ref, g_ref, du_ref, dwi_ref, dwh_ref, dbh_ref,
         bc_ref, bhh_ref, sc_ref, shp_ref) = refs
    else:
        (ko_ref, kc_ref, mk_ref, u_ref, wi_ref, wh_ref, bh_ref, g_ref,
         du_ref, dwi_ref, dwh_ref, dbh_ref,
         bc_ref, bhh_ref, sc_ref, shp_ref) = refs
        ro_ref = rc_ref = None
    pid = pl.program_id(0)
    tb = ko_ref.shape[1]
    hh = wh_ref.shape[0]
    hdp = u_ref.shape[1]
    nbx1 = u_ref.shape[0]
    nch = ell // chunk
    u2 = u_ref[:]
    wi = wi_ref[:]
    wh = wh_ref[:]
    bh = bh_ref[:]
    tbw = tb // waves
    wsl = [slice(k * tbw, (k + 1) * tbw) for k in range(waves)]
    zero = jnp.zeros((tbw, hh), jnp.float32)
    winit = tuple((zero, zero) for _ in range(waves))

    def z_of(t):
        (beo, zo), (bec, zc) = _kt_z(ko_ref, kc_ref, ro_ref, rc_ref,
                                     mk_ref, u2, shift, t)
        xt = jnp.maximum(zo, 0.0) + jnp.maximum(zc, 0.0)
        return beo, zo, bec, zc, xt

    def gates_of_w(c, hid, xk):
        """Per-wave gates from the wave's [tbw, hdp] hidden rows."""
        a = (jnp.dot(xk, wi, preferred_element_type=jnp.float32)
             + jnp.dot(hid, wh, preferred_element_type=jnp.float32) + bh)
        gi = jax.nn.sigmoid(a[:, :hh])
        gf = jax.nn.sigmoid(a[:, hh:2 * hh])
        gg = jnp.tanh(a[:, 2 * hh:3 * hh])
        go = jax.nn.sigmoid(a[:, 3 * hh:])
        keep = xk[:, hdp - 1:hdp] > 0
        return gi, gf, gg, go, keep

    # phase 1: forward, storing only chunk-boundary carries. Like the
    # forward kernel, `waves` independent sub-block chains per step let
    # the scheduler overlap one wave's MXU gate matmul with another's
    # VPU chain (VERDICT r4 item 2).
    def fstep(t, carry):
        _, _, _, _, xt = z_of(t)
        new = []
        for k in range(waves):
            c, hid = carry[k]
            gi, gf, gg, go, keep = gates_of_w(c, hid, xt[wsl[k]])
            nc = gf * c + gi * gg
            nh = go * jnp.tanh(nc)
            new.append((jnp.where(keep, nc, c),
                        jnp.where(keep, nh, hid)))
        return tuple(new)

    def cat_w(parts):
        return parts[0] if waves == 1 else jnp.concatenate(parts,
                                                           axis=0)

    carry = winit
    for ci in range(nch):
        bc_ref[ci] = cat_w([cw[0] for cw in carry])
        bhh_ref[ci] = cat_w([cw[1] for cw in carry])
        carry = jax.lax.fori_loop(ci * chunk, (ci + 1) * chunk, fstep,
                                  carry)

    # phase 2: chunks in reverse — re-forward the chunk stashing only
    # (c_prev, h_prev) per step, then BPTT with gates recomputed from
    # those (the per-step key->hidden recompute is ~2% of the matmuls)
    dh0 = g_ref[:]
    acc0 = (jnp.zeros((nbx1, hdp), jnp.float32),
            jnp.zeros((hdp, 4 * hh), jnp.float32),
            jnp.zeros((hh, 4 * hh), jnp.float32),
            jnp.zeros((1, 4 * hh), jnp.float32))
    # per-wave (dc, dh) chains + per-wave grad accumulators keep the
    # waves independent through the whole reverse walk; the shared
    # du/dwi/dwh/dbh sums happen once after the loops
    wstate = tuple((zero, dh0[wsl[k]]) for k in range(waves))
    waccs = tuple(acc0 for _ in range(waves))
    for ci in reversed(range(nch)):
        def rstep(j, carry, ci=ci):
            sc_ref[pl.ds(j, 1)] = cat_w([cw[0] for cw in carry])[None]
            shp_ref[pl.ds(j, 1)] = cat_w([cw[1] for cw in carry])[None]
            return fstep(ci * chunk + j, carry)

        jax.lax.fori_loop(0, chunk, rstep,
                          tuple((bc_ref[ci][wsl[k]], bhh_ref[ci][wsl[k]])
                                for k in range(waves)))

        def bstep(jr, carry, ci=ci):
            wstate, waccs = carry
            j = chunk - 1 - jr
            t = ci * chunk + j
            beo, zo, bec, zc, xt = z_of(t)
            cpf = sc_ref[pl.ds(j, 1)].reshape(tb, hh)
            hpf = shp_ref[pl.ds(j, 1)].reshape(tb, hh)
            nstate, naccs = [], []
            for k in range(waves):
                dc, dh = wstate[k]
                du_a, dwi_a, dwh_a, dbh_a = waccs[k]
                cp = cpf[wsl[k]]
                hp = hpf[wsl[k]]
                xk = xt[wsl[k]]
                gi, gf, gg, go, keep = gates_of_w(cp, hp, xk)
                nc = gf * cp + gi * gg
                tnc = jnp.tanh(nc)
                dgo = dh * tnc * go * (1.0 - go)
                dnc = dc + dh * go * (1.0 - tnc * tnc)
                dgi = dnc * gg * gi * (1.0 - gi)
                dgf = dnc * cp * gf * (1.0 - gf)
                dgg = dnc * gi * (1.0 - gg * gg)
                dgates = jnp.concatenate([dgi, dgf, dgg, dgo], axis=1)
                dgates = jnp.where(keep, dgates, 0.0)    # [tbw, 4H]
                # contraction over rows (dim 0 both): x^T dgates etc.
                cdim = (((0,), (0,)), ((), ()))
                dwi_a += jax.lax.dot_general(
                    xk, dgates, dimension_numbers=cdim,
                    preferred_element_type=jnp.float32)
                dwh_a += jax.lax.dot_general(
                    hp, dgates, dimension_numbers=cdim,
                    preferred_element_type=jnp.float32)
                dbh_a += dgates.sum(axis=0, keepdims=True)
                # contraction over 4H (dim 1 both): dgates @ W^T
                cT = (((1,), (1,)), ((), ()))
                dxt = jax.lax.dot_general(
                    dgates, wi, dimension_numbers=cT,
                    preferred_element_type=jnp.float32)   # [tbw, hdp]
                # dU through both relu sides: dU += be^T-contracted dz
                dzo = jnp.where(zo[wsl[k]] > 0, dxt, 0.0)
                dzc = jnp.where(zc[wsl[k]] > 0, dxt, 0.0)
                du_a += (jnp.dot(beo[:, wsl[k]], dzo,
                                 preferred_element_type=jnp.float32)
                         + jnp.dot(bec[:, wsl[k]], dzc,
                                   preferred_element_type=jnp.float32))
                dhp = jax.lax.dot_general(
                    dgates, wh, dimension_numbers=cT,
                    preferred_element_type=jnp.float32) \
                    + jnp.where(keep, 0.0, dh)
                dcp = jnp.where(keep, dnc * gf, dc)
                nstate.append((dcp, dhp))
                naccs.append((du_a, dwi_a, dwh_a, dbh_a))
            return (tuple(nstate), tuple(naccs))

        wstate, waccs = jax.lax.fori_loop(0, chunk, bstep,
                                          (wstate, waccs))

    du_a = sum(a[0] for a in waccs)
    dwi_a = sum(a[1] for a in waccs)
    dwh_a = sum(a[2] for a in waccs)
    dbh_a = sum(a[3] for a in waccs)

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


def _klstm_t_specs(tb, ellp, nbx1, hdp, hh, has_root):
    blk = lambda shape, imap: pl.BlockSpec(shape, imap,
                                           memory_space=pltpu.VMEM)
    plane = lambda: blk((ellp, tb), lambda i: (0, i))
    ins = [plane(), plane()]
    if has_root:
        ins += [plane(), plane()]
    ins += [plane(),
            blk((nbx1, hdp), lambda i: (0, 0)),
            blk((hdp, 4 * hh), lambda i: (0, 0)),
            blk((hh, 4 * hh), lambda i: (0, 0)),
            blk((1, 4 * hh), lambda i: (0, 0))]
    return ins, blk


def _klstm_t_fwd_call(ko, kc, roots, mk, u2, wi2, wh, bh, tb, ellp,
                      shift, interpret, waves=1):
    bp = ko.shape[1]
    nbx1, hdp = u2.shape
    hh = wh.shape[0]
    ins, blk = _klstm_t_specs(tb, ellp, nbx1, hdp, hh, roots is not None)
    args = (ko, kc) + (roots or ()) + (mk, u2, wi2, wh, bh)
    return pl.pallas_call(
        functools.partial(_klstm_t_fwd_kernel, ellp, shift,
                          roots is not None, waves),
        grid=(bp // tb,),
        in_specs=ins,
        out_specs=blk((tb, hh), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((bp, hh), jnp.float32),
        interpret=interpret,
    )(*args)


def _klstm_t_bwd_call(ko, kc, roots, mk, u2, wi2, wh, bh, g, tb, ellp,
                      chunk, shift, interpret, waves=1):
    bp = ko.shape[1]
    nbx1, hdp = u2.shape
    hh = wh.shape[0]
    nch = ellp // chunk
    ins, blk = _klstm_t_specs(tb, ellp, nbx1, hdp, hh, roots is not None)
    args = (ko, kc) + (roots or ()) + (mk, u2, wi2, wh, bh, g)
    return pl.pallas_call(
        functools.partial(_klstm_t_bwd_kernel, ellp, chunk, shift,
                          roots is not None, waves),
        grid=(bp // tb,),
        in_specs=ins + [blk((tb, hh), lambda i: (i, 0))],
        out_specs=(blk((nbx1, hdp), lambda i: (0, 0)),
                   blk((hdp, 4 * hh), lambda i: (0, 0)),
                   blk((hh, 4 * hh), lambda i: (0, 0)),
                   blk((1, 4 * hh), lambda i: (0, 0))),
        out_shape=(jax.ShapeDtypeStruct((nbx1, hdp), jnp.float32),
                   jax.ShapeDtypeStruct((hdp, 4 * hh), jnp.float32),
                   jax.ShapeDtypeStruct((hh, 4 * hh), jnp.float32),
                   jax.ShapeDtypeStruct((1, 4 * hh), jnp.float32)),
        scratch_shapes=[pltpu.VMEM((nch, tb, hh), jnp.float32),
                        pltpu.VMEM((nch, tb, hh), jnp.float32),
                        pltpu.VMEM((chunk, tb, hh), jnp.float32),
                        pltpu.VMEM((chunk, tb, hh), jnp.float32)],
        interpret=interpret,
    )(*args)


@functools.partial(jax.custom_vjp,
                   nondiff_argnums=(8, 9, 10, 11, 12, 13, 14))
def _klstmt(ko, kc, roots, mk, u2, wi2, wh, bh, tb, tb_bwd, ellp, chunk,
            shift, interpret, waves):
    return _klstm_t_fwd_call(ko, kc, roots, mk, u2, wi2, wh, bh, tb,
                             ellp, shift, interpret, waves)


def _klstmt_fwd(ko, kc, roots, mk, u2, wi2, wh, bh, tb, tb_bwd, ellp,
                chunk, shift, interpret, waves):
    return (_klstm_t_fwd_call(ko, kc, roots, mk, u2, wi2, wh, bh, tb,
                              ellp, shift, interpret, waves),
            (ko, kc, roots, mk, u2, wi2, wh, bh))


def _klstmt_bwd(tb, tb_bwd, ellp, chunk, shift, interpret, waves, res,
                g):
    ko, kc, roots, mk, u2, wi2, wh, bh = res
    du, dwi, dwh, dbh = _klstm_t_bwd_call(
        ko, kc, roots, mk, u2, wi2, wh, bh, g.astype(jnp.float32),
        tb_bwd, ellp, chunk, shift, interpret, waves)
    f0 = lambda a: np.zeros(a.shape, jax.dtypes.float0)
    rz = None if roots is None else tuple(f0(r) for r in roots)
    return f0(ko), f0(kc), rz, f0(mk), du, dwi, dwh, dbh


_klstmt.defvjp(_klstmt_fwd, _klstmt_bwd)


# ---------------------------------------------------------------------------
# Second-generation transposed keys-LSTM ("t2"): chunked field
# extraction + fully transposed recurrence state + early-exit chunks.
#
# r5 decomposition (scripts/probe_lstm_waves.py on v5e, [2,4096,301]):
# the per-step key->hidden recompute (`justz`) alone costs 5.64 ms of
# the 12.8 ms forward — NOT the "~2%" its FLOP share suggests, because
# every _kt_z step operates on [1, tb] single-SUBLANE rows (1/8 VPU
# width) and issues per-step dynamic slices; and the cheap-activation
# probe showed transcendentals are NOT the bound. t2 therefore:
#   * extracts the bit-fields for a CHUNK of cs steps at once on
#     [cs, tb] sublane-dense planes into a [cs, nbxe, tb] VMEM scratch
#     (8x the VPU width of the per-step form),
#   * keeps the whole recurrence TRANSPOSED ([hh, tb]: hidden on
#     sublanes, rows on lanes) so the per-step z is one
#     [hdp, nbxe] x [nbxe, tb] matmul with no [*, 128-pad] hdp-lane
#     waste, and gate elementwise runs on fully-packed [4hh, tb] tiles,
#   * sorts rows by valid size (caller-side, inside jit) and skips
#     whole chunks past each tile's max valid step via an SMEM bound —
#     recovering the ~40% masked-tail work of skewed set-size batches.

def _t2_extract(k_c, root_c, mk_c, shift, ncol, bes_ref):
    """Chunked _be2_of: write [cs, nbxe, tb] field planes for keys
    k_c [cs, tb]. Row order matches _fields_ext + mask row: ncol-1
    shift-fields (or ncol with in-key root), root, invalid, ones,
    mask."""
    cs, tb = k_c.shape
    f32 = jnp.float32
    r = 0
    nf = ncol if root_c is None else ncol - 1
    for j in range(nf):
        fm = jnp.uint32(1) if (root_c is None and j == ncol - 1) \
            else jnp.uint32((1 << shift) - 1)
        val = ((k_c >> jnp.uint32(j * shift)) & fm).astype(
            jnp.int32).astype(f32)
        bes_ref[:, r, :] = val
        r += 1
    if root_c is not None:
        bes_ref[:, r, :] = root_c.astype(f32)
        r += 1
    bes_ref[:, r, :] = jnp.zeros((cs, tb), f32)          # invalid
    bes_ref[:, r + 1, :] = jnp.ones((cs, tb), f32)       # always-one
    bes_ref[:, r + 2, :] = mk_c.astype(f32)              # slot-valid


def _t2_gates(u2t, wit, wht, bht, beo_j, bec_j, hT, cT):
    """One transposed step: returns (xtT, gi, gf, gg, go, keep, ncT,
    nhT)."""
    hh = wht.shape[1]
    zo = jnp.dot(u2t, beo_j, preferred_element_type=jnp.float32)
    zc = jnp.dot(u2t, bec_j, preferred_element_type=jnp.float32)
    xtT = jnp.maximum(zo, 0.0) + jnp.maximum(zc, 0.0)    # [hdp, tb]
    gates = (jnp.dot(wit, xtT, preferred_element_type=jnp.float32)
             + jnp.dot(wht, hT, preferred_element_type=jnp.float32)
             + bht)
    gi = jax.nn.sigmoid(gates[:hh])
    gf = jax.nn.sigmoid(gates[hh:2 * hh])
    gg = jnp.tanh(gates[2 * hh:3 * hh])
    go = jax.nn.sigmoid(gates[3 * hh:])
    keep = xtT[-1:, :] > 0                                # [1, tb]
    ncT = gf * cT + gi * gg
    nhT = go * jnp.tanh(ncT)
    return zo, zc, xtT, gi, gf, gg, go, keep, ncT, nhT


def _klstm_t2_fwd_kernel(ell, cs, shift, has_root, ncol, *refs):
    (tmax_ref, ko_ref, kc_ref, *rest) = refs
    if has_root:
        ro_ref, rc_ref, *rest = rest
    else:
        ro_ref = rc_ref = None
    (mk_ref, u2t_ref, wit_ref, wht_ref, bht_ref, out_ref,
     beso_ref, besc_ref, cst_ref, hst_ref) = rest
    tb = ko_ref.shape[1]
    hh = wht_ref.shape[1]
    u2t = u2t_ref[:]
    wit = wit_ref[:]
    wht = wht_ref[:]
    bht = bht_ref[:]
    pid = pl.program_id(0)
    tmax = tmax_ref[pid]
    cst_ref[:] = jnp.zeros_like(cst_ref)
    hst_ref[:] = jnp.zeros_like(hst_ref)
    nch = ell // cs

    for ci in range(nch):
        @pl.when(ci * cs < tmax)
        def _(ci=ci):
            c0 = ci * cs
            _t2_extract(ko_ref[pl.ds(c0, cs), :],
                        None if ro_ref is None
                        else ro_ref[pl.ds(c0, cs), :],
                        mk_ref[pl.ds(c0, cs), :], shift, ncol, beso_ref)
            _t2_extract(kc_ref[pl.ds(c0, cs), :],
                        None if rc_ref is None
                        else rc_ref[pl.ds(c0, cs), :],
                        mk_ref[pl.ds(c0, cs), :], shift, ncol, besc_ref)

            def step(j, carry):
                cT, hT = carry
                beo_j = beso_ref[pl.ds(j, 1)].reshape(
                    beso_ref.shape[1], beso_ref.shape[2])
                bec_j = besc_ref[pl.ds(j, 1)].reshape(
                    besc_ref.shape[1], besc_ref.shape[2])
                *_, keep, ncT, nhT = _t2_gates(u2t, wit, wht, bht,
                                               beo_j, bec_j, hT, cT)
                return (jnp.where(keep, ncT, cT),
                        jnp.where(keep, nhT, hT))

            cT, hT = jax.lax.fori_loop(0, cs, step,
                                       (cst_ref[:], hst_ref[:]))
            cst_ref[:] = cT
            hst_ref[:] = hT

    out_ref[:] = hst_ref[:]


def _klstm_t2_bwd_kernel(ell, cs, shift, has_root, ncol, *refs):
    (tmax_ref, ko_ref, kc_ref, *rest) = refs
    if has_root:
        ro_ref, rc_ref, *rest = rest
    else:
        ro_ref = rc_ref = None
    (mk_ref, u2t_ref, wit_ref, wht_ref, bht_ref, g_ref,
     du_ref, dwi_ref, dwh_ref, dbh_ref,
     beso_ref, besc_ref, bc_ref, bhh_ref, sc_ref, shp_ref,
     cst_ref, hst_ref, dua_ref, dwia_ref, dwha_ref, dbha_ref) = rest
    pid = pl.program_id(0)
    tb = ko_ref.shape[1]
    hh = wht_ref.shape[1]
    nch = ell // cs
    u2t = u2t_ref[:]
    wit = wit_ref[:]
    wht = wht_ref[:]
    bht = bht_ref[:]
    tmax = tmax_ref[pid]

    def extract_chunk(ci):
        c0 = ci * cs
        _t2_extract(ko_ref[pl.ds(c0, cs), :],
                    None if ro_ref is None
                    else ro_ref[pl.ds(c0, cs), :],
                    mk_ref[pl.ds(c0, cs), :], shift, ncol, beso_ref)
        _t2_extract(kc_ref[pl.ds(c0, cs), :],
                    None if rc_ref is None
                    else rc_ref[pl.ds(c0, cs), :],
                    mk_ref[pl.ds(c0, cs), :], shift, ncol, besc_ref)

    def be_at(ref, j):
        return ref[pl.ds(j, 1)].reshape(ref.shape[1], ref.shape[2])

    def fstep(j, carry):
        cT, hT = carry
        *_, keep, ncT, nhT = _t2_gates(u2t, wit, wht, bht,
                                       be_at(beso_ref, j),
                                       be_at(besc_ref, j), hT, cT)
        return (jnp.where(keep, ncT, cT), jnp.where(keep, nhT, hT))

    # phase 1: forward, chunk-boundary carries only; state lives in
    # scratch so skipped chunks (past this tile's max valid step) do
    # no work at all
    cst_ref[:] = jnp.zeros_like(cst_ref)
    hst_ref[:] = jnp.zeros_like(hst_ref)
    for ci in range(nch):
        bc_ref[ci] = cst_ref[:]
        bhh_ref[ci] = hst_ref[:]

        @pl.when(ci * cs < tmax)
        def _(ci=ci):
            extract_chunk(ci)
            cT, hT = jax.lax.fori_loop(0, cs, fstep,
                                       (cst_ref[:], hst_ref[:]))
            cst_ref[:] = cT
            hst_ref[:] = hT

    # phase 2: reverse chunks; (dc, dh) ride the cst/hst scratch, grad
    # accumulators ride their own scratch
    cst_ref[:] = jnp.zeros_like(cst_ref)          # dc
    hst_ref[:] = g_ref[:]                         # dh
    dua_ref[:] = jnp.zeros_like(dua_ref)
    dwia_ref[:] = jnp.zeros_like(dwia_ref)
    dwha_ref[:] = jnp.zeros_like(dwha_ref)
    dbha_ref[:] = jnp.zeros_like(dbha_ref)
    for ci in reversed(range(nch)):
        @pl.when(ci * cs < tmax)
        def _(ci=ci):
            extract_chunk(ci)

            def rstep(j, carry):
                sc_ref[pl.ds(j, 1)] = carry[0][None]
                shp_ref[pl.ds(j, 1)] = carry[1][None]
                return fstep(j, carry)

            jax.lax.fori_loop(0, cs, rstep, (bc_ref[ci], bhh_ref[ci]))

            def bstep(jr, carry):
                dc, dh, du_a, dwi_a, dwh_a, dbh_a = carry
                j = cs - 1 - jr
                cp = sc_ref[pl.ds(j, 1)].reshape(hh, tb)
                hp = shp_ref[pl.ds(j, 1)].reshape(hh, tb)
                beo_j = be_at(beso_ref, j)
                bec_j = be_at(besc_ref, j)
                zo, zc, xtT, gi, gf, gg, go, keep, ncT, _ = _t2_gates(
                    u2t, wit, wht, bht, beo_j, bec_j, hp, cp)
                tnc = jnp.tanh(ncT)
                dgo = dh * tnc * go * (1.0 - go)
                dnc = dc + dh * go * (1.0 - tnc * tnc)
                dgi = dnc * gg * gi * (1.0 - gi)
                dgf = dnc * cp * gf * (1.0 - gf)
                dgg = dnc * gi * (1.0 - gg * gg)
                dgates = jnp.concatenate([dgi, dgf, dgg, dgo], axis=0)
                dgates = jnp.where(keep, dgates, 0.0)    # [4hh, tb]
                # contractions over tb (lanes of both operands)
                cL = (((1,), (1,)), ((), ()))
                dwi_a += jax.lax.dot_general(
                    xtT, dgates, dimension_numbers=cL,
                    preferred_element_type=jnp.float32)   # [hdp, 4hh]
                dwh_a += jax.lax.dot_general(
                    hp, dgates, dimension_numbers=cL,
                    preferred_element_type=jnp.float32)   # [hh, 4hh]
                dbh_a += dgates.sum(axis=1, keepdims=True)
                # dxt = wit^T @ dgates (contract 4hh, dim 0 of both)
                c0d = (((0,), (0,)), ((), ()))
                dxt = jax.lax.dot_general(
                    wit, dgates, dimension_numbers=c0d,
                    preferred_element_type=jnp.float32)   # [hdp, tb]
                dzo = jnp.where(zo > 0, dxt, 0.0)
                dzc = jnp.where(zc > 0, dxt, 0.0)
                du_a += (jax.lax.dot_general(
                    beo_j, dzo, dimension_numbers=cL,
                    preferred_element_type=jnp.float32)
                    + jax.lax.dot_general(
                        bec_j, dzc, dimension_numbers=cL,
                        preferred_element_type=jnp.float32))
                dhp = jax.lax.dot_general(
                    wht, dgates, dimension_numbers=c0d,
                    preferred_element_type=jnp.float32) \
                    + jnp.where(keep, 0.0, dh)
                dcp = jnp.where(keep, dnc * gf, dc)
                return (dcp, dhp, du_a, dwi_a, dwh_a, dbh_a)

            out = jax.lax.fori_loop(
                0, cs, bstep,
                (cst_ref[:], hst_ref[:], dua_ref[:], dwia_ref[:],
                 dwha_ref[:], dbha_ref[:]))
            cst_ref[:] = out[0]
            hst_ref[:] = out[1]
            dua_ref[:] = out[2]
            dwia_ref[:] = out[3]
            dwha_ref[:] = out[4]
            dbha_ref[:] = out[5]

    @pl.when(pid == 0)
    def _():
        du_ref[:] = jnp.zeros_like(du_ref)
        dwi_ref[:] = jnp.zeros_like(dwi_ref)
        dwh_ref[:] = jnp.zeros_like(dwh_ref)
        dbh_ref[:] = jnp.zeros_like(dbh_ref)

    du_ref[:] += dua_ref[:]
    dwi_ref[:] += dwia_ref[:]
    dwh_ref[:] += dwha_ref[:]
    dbh_ref[:] += dbha_ref[:]


def _lstm_from_keys_t2(kown, kcross_al, mask, u_ext, wi, wh, bh, shift,
                       root_own, root_cross, interpret):
    """t2 entry: size-sort rows (non-diff operands only), compute
    per-tile max-valid-step bounds, run the transposed kernels, unsort.
    Returns [Q, B, H] like the t1 path."""
    q, b, ell = kown.shape
    hh = wh.shape[0]
    nbx, hd = u_ext.shape
    b2 = q * b
    has_root = root_own is not None
    tb, tb_bwd, cs, cs_bwd, ellp = _pick_t2_tiles(
        b2, ell, nbx + 1, hd + 1, hh, has_root)
    bp = -(-b2 // tb) * tb

    sizes = mask.reshape(b2, ell).sum(-1).astype(jnp.int32)
    order = jnp.argsort(sizes)
    inv = jnp.argsort(order)

    def prep(a, fill=0):
        a = a.reshape(b2, ell)[order]
        if bp != b2 or ellp != ell:
            a = jnp.pad(a, [(0, bp - b2), (0, ellp - ell)],
                        constant_values=fill)
        return a.T          # [ellp, bp]

    ko = prep(kown)
    kc = prep(kcross_al)
    mk = prep(mask.astype(jnp.int32))
    roots = None
    if root_own is not None:
        roots = (prep(root_own.astype(jnp.int32)),
                 prep(root_cross.astype(jnp.int32)))
    ssort = jnp.pad(sizes[order], (0, bp - b2))
    tmax_f = ssort.reshape(bp // tb, tb).max(axis=1)
    tmax_b = ssort.reshape(bp // tb_bwd, tb_bwd).max(axis=1)
    u2 = jnp.pad(u_ext.astype(jnp.float32), [(0, 1), (0, 1)])
    u2 = u2.at[nbx, hd].set(1.0)
    wi2 = jnp.pad(wi.astype(jnp.float32), [(0, 1), (0, 0)])
    out = _klstmt2(ko, kc, roots, mk, tmax_f, tmax_b, u2, wi2,
                   (wh.astype(jnp.float32),
                    bh.reshape(1, -1).astype(jnp.float32)),
                   tb, tb_bwd, ellp, cs, cs_bwd, shift, interpret)
    return out.T[:b2][inv].reshape(q, b, hh)


def _t2_specs(tb, ellp, nbxe, hdp, hh, has_root):
    blk = lambda shape, imap: pl.BlockSpec(shape, imap,
                                           memory_space=pltpu.VMEM)
    plane = lambda: blk((ellp, tb), lambda i: (0, i))
    ins = [pl.BlockSpec(memory_space=pltpu.SMEM)]        # tmax [ngrid]
    ins += [plane(), plane()]
    if has_root:
        ins += [plane(), plane()]
    ins += [plane(),
            blk((hdp, nbxe), lambda i: (0, 0)),          # u2t
            blk((4 * hh, hdp), lambda i: (0, 0)),        # wit
            blk((4 * hh, hh), lambda i: (0, 0)),         # wht
            blk((4 * hh, 1), lambda i: (0, 0))]          # bht
    return ins, blk


def _klstm_t2_fwd_call(tmax, ko, kc, roots, mk, u2t, wit, wht, bht,
                       tb, ellp, cs, shift, interpret):
    bp = ko.shape[1]
    hdp, nbxe = u2t.shape
    hh = wht.shape[1]
    ncol = nbxe - 3
    ins, blk = _t2_specs(tb, ellp, nbxe, hdp, hh, roots is not None)
    args = (tmax, ko, kc) + (roots or ()) + (mk, u2t, wit, wht, bht)
    return pl.pallas_call(
        functools.partial(_klstm_t2_fwd_kernel, ellp, cs, shift,
                          roots is not None, ncol),
        grid=(bp // tb,),
        in_specs=ins,
        out_specs=blk((hh, tb), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((hh, bp), jnp.float32),
        scratch_shapes=[pltpu.VMEM((cs, nbxe, tb), jnp.float32),
                        pltpu.VMEM((cs, nbxe, tb), jnp.float32),
                        pltpu.VMEM((hh, tb), jnp.float32),
                        pltpu.VMEM((hh, tb), jnp.float32)],
        interpret=interpret,
    )(*args)


def _klstm_t2_bwd_call(tmax, ko, kc, roots, mk, u2t, wit, wht, bht, g,
                       tb, ellp, cs, shift, interpret):
    bp = ko.shape[1]
    hdp, nbxe = u2t.shape
    hh = wht.shape[1]
    ncol = nbxe - 3
    nch = ellp // cs
    ins, blk = _t2_specs(tb, ellp, nbxe, hdp, hh, roots is not None)
    args = (tmax, ko, kc) + (roots or ()) + (mk, u2t, wit, wht, bht, g)
    return pl.pallas_call(
        functools.partial(_klstm_t2_bwd_kernel, ellp, cs, shift,
                          roots is not None, ncol),
        grid=(bp // tb,),
        in_specs=ins + [blk((hh, tb), lambda i: (0, i))],
        out_specs=(blk((nbxe, hdp), lambda i: (0, 0)),
                   blk((hdp, 4 * hh), lambda i: (0, 0)),
                   blk((hh, 4 * hh), lambda i: (0, 0)),
                   blk((4 * hh, 1), lambda i: (0, 0))),
        out_shape=(jax.ShapeDtypeStruct((nbxe, hdp), jnp.float32),
                   jax.ShapeDtypeStruct((hdp, 4 * hh), jnp.float32),
                   jax.ShapeDtypeStruct((hh, 4 * hh), jnp.float32),
                   jax.ShapeDtypeStruct((4 * hh, 1), jnp.float32)),
        scratch_shapes=[pltpu.VMEM((cs, nbxe, tb), jnp.float32),
                        pltpu.VMEM((cs, nbxe, tb), jnp.float32),
                        pltpu.VMEM((nch, hh, tb), jnp.float32),
                        pltpu.VMEM((nch, hh, tb), jnp.float32),
                        pltpu.VMEM((cs, hh, tb), jnp.float32),
                        pltpu.VMEM((cs, hh, tb), jnp.float32),
                        pltpu.VMEM((hh, tb), jnp.float32),
                        pltpu.VMEM((hh, tb), jnp.float32),
                        pltpu.VMEM((nbxe, hdp), jnp.float32),
                        pltpu.VMEM((hdp, 4 * hh), jnp.float32),
                        pltpu.VMEM((hh, 4 * hh), jnp.float32),
                        pltpu.VMEM((4 * hh, 1), jnp.float32)],
        interpret=interpret,
    )(*args)


def _t2_vmem(tb, ellp, cs, nbxe, hdp, hh, has_root, bwd) -> int:
    """f32 bytes resident per grid cell (lane dims pad to 128)."""
    lp = lambda n: -(-n // 128) * 128
    planes = 2 * (5 if has_root else 3) * ellp * lp(tb)
    bes = 2 * cs * max(nbxe, 8) * lp(tb)
    state = 2 * hh * lp(tb)
    ops = hdp * lp(nbxe) + 4 * hh * lp(hdp) + 4 * hh * lp(hh) \
        + 4 * hh * lp(1)
    tot = planes + bes + state + ops + hh * lp(tb)
    if bwd:
        nch = ellp // cs
        tot += 2 * nch * hh * lp(tb) + 2 * cs * hh * lp(tb)
        tot += 2 * (max(nbxe, 8) * lp(hdp) + hdp * lp(4 * hh)
                    + 4 * hh * lp(hh) + 4 * hh * lp(1))
    return 4 * tot


def _pick_cs(ell, tb, nbxe, hdp, hh, has_root, bwd):
    """BPTT/extraction chunk: the backward footprint is U-shaped in cs
    (boundary carries ~ell/cs vs chunk scratch ~cs), so probe
    candidates largest-first and take the first that fits."""
    budget = _vmem_budget()
    best, best_v = 8, None
    for cand in (64, 48, 32, 24, 16, 8):
        v = _t2_vmem(tb, -(-ell // cand) * cand, cand, nbxe, hdp, hh,
                     has_root, bwd)
        if v <= budget:
            return cand
        if best_v is None or v < best_v:
            best, best_v = cand, v
    return best


def _pick_t2_tiles(b2, ell, nbxe, hdp, hh, has_root):
    """(tb, tb_bwd, cs, cs_bwd, ellp). Same lane rules as _pick_tiles:
    tiles at multiples of 128 (whole array below 128)."""
    budget = _vmem_budget()
    if b2 < 128:
        tb = tb_bwd = b2
        cs = _pick_cs(ell, tb, nbxe, hdp, hh, has_root, False)
        cs_bwd = _pick_cs(ell, tb_bwd, nbxe, hdp, hh, has_root, True)
    else:
        tb = 128
        for cand in (512, 256):
            cs_c = _pick_cs(ell, cand, nbxe, hdp, hh, has_root, False)
            if (cand <= -(-b2 // 128) * 128
                    and _t2_vmem(cand, -(-ell // cs_c) * cs_c, cs_c,
                                 nbxe, hdp, hh, has_root,
                                 False) <= budget):
                tb = cand
                break
        tb_bwd = 128
        for cand in (256,):
            cs_c = _pick_cs(ell, cand, nbxe, hdp, hh, has_root, True)
            if (cand <= tb and tb % cand == 0
                    and _t2_vmem(cand, -(-ell // cs_c) * cs_c, cs_c,
                                 nbxe, hdp, hh, has_root,
                                 True) <= budget):
                tb_bwd = cand
                break
        cs = _pick_cs(ell, tb, nbxe, hdp, hh, has_root, False)
        cs_bwd = _pick_cs(ell, tb_bwd, nbxe, hdp, hh, has_root, True)
    lcm = cs * cs_bwd // math.gcd(cs, cs_bwd)
    ellp = -(-ell // lcm) * lcm
    return tb, tb_bwd, cs, cs_bwd, ellp


@functools.partial(jax.custom_vjp,
                   nondiff_argnums=(9, 10, 11, 12, 13, 14, 15))
def _klstmt2(ko, kc, roots, mk, tmax_f, tmax_b, u2, wi2, wh_bh,
             tb, tb_bwd, ellp, cs, cs_bwd, shift, interpret):
    wh, bh = wh_bh
    return _klstm_t2_fwd_call(tmax_f, ko, kc, roots, mk, u2.T,
                              wi2.T, wh.T, bh.T, tb, ellp, cs, shift,
                              interpret)


def _klstmt2_fwd(ko, kc, roots, mk, tmax_f, tmax_b, u2, wi2, wh_bh,
                 tb, tb_bwd, ellp, cs, cs_bwd, shift, interpret):
    out = _klstm_t2_fwd_call(tmax_f, ko, kc, roots, mk, u2.T, wi2.T,
                             wh_bh[0].T, wh_bh[1].T, tb, ellp, cs,
                             shift, interpret)
    return out, (ko, kc, roots, mk, tmax_f, tmax_b, u2, wi2, wh_bh)


def _klstmt2_bwd(tb, tb_bwd, ellp, cs, cs_bwd, shift, interpret, res,
                 g):
    ko, kc, roots, mk, tmax_f, tmax_b, u2, wi2, wh_bh = res
    wh, bh = wh_bh
    du, dwi, dwh, dbh = _klstm_t2_bwd_call(
        tmax_b, ko, kc, roots, mk, u2.T, wi2.T, wh.T, bh.T,
        g.astype(jnp.float32), tb_bwd, ellp, cs_bwd, shift, interpret)
    f0 = lambda a: np.zeros(a.shape, jax.dtypes.float0)
    rz = None if roots is None else tuple(f0(r) for r in roots)
    return (f0(ko), f0(kc), rz, f0(mk), f0(tmax_f), f0(tmax_b), du,
            dwi, (dwh, dbh.T))


_klstmt2.defvjp(_klstmt2_fwd, _klstmt2_bwd)


def lstm_from_keys(kown: jax.Array, kcross_al: jax.Array,
                   mask: jax.Array, u_ext: jax.Array, wi: jax.Array,
                   wh: jax.Array, bh: jax.Array, shift: int,
                   root_own: jax.Array | None = None,
                   root_cross: jax.Array | None = None,
                   tb: int | None = None, tb_bwd: int | None = None,
                   chunk: int | None = None,
                   interpret: bool | None = None,
                   waves: int | None = None,
                   impl: str | None = None) -> jax.Array:
    """Masked LSTM final hidden directly from packed keys -> [Q, B, H].

    kown/kcross_al: uint32 [Q, B, L] slot-aligned; mask bool [Q, B, L];
    u_ext as in fused_key_hidden_sum (hidden rows = relu both sides
    summed); wi [h, 4H] (projection-folded input weights), wh [H, 4H],
    bh [4H]. Differentiable wrt u_ext/wi/wh/bh; the per-slot hidden rows
    exist only as per-step registers in both directions (transposed
    layout — see the section comment above)."""
    if interpret is None:
        interpret = _default_interpret()
    # t2 (r5 default): chunked-extraction transposed kernels — measured
    # v5e production A/B (probe_fused_ab lstm:1): train 210.8k vs 69.3k
    # q/s (x3.04), inference 435.3k vs 253.8k (x1.72); HW parity OK at
    # M=100 and M=200 (probe_hw_parity). SUREL_LSTM_IMPL=t1 restores
    # the first-generation transposed kernel.
    if impl is None:
        impl = os.environ.get("SUREL_LSTM_IMPL", "t2")
    q, b, ell = kown.shape
    hh = wh.shape[0]
    nbx, hd = u_ext.shape
    b2 = q * b
    has_root = root_own is not None
    if impl == "t2":
        return _lstm_from_keys_t2(kown, kcross_al, mask, u_ext, wi, wh,
                                  bh, shift, root_own, root_cross,
                                  interpret)
    # row tiles: lane (minor) dims must be %128 or the whole array, so
    # with b2 >= 128 tb is honored only at multiples of 128 (anything
    # else falls back to 128; sub-128 row counts use the whole array).
    # The recurrence is LATENCY-bound (0.82 us per dependent tile-step
    # at tb=128), so wider forward tiles amortize it over more rows:
    # tb=512 measured fwd x1.57 / fwd+bwd (with tb_bwd=256) x1.45 over
    # tb=128 at [2,4096,301] on v5e (scripts/probe_lstm_tb2.py) —
    # that's the auto default. The backward's chunk scratch scales with
    # tb, so it takes its own tile, auto-picked as the widest whose
    # VMEM model fits at any chunk; tb_bwd must divide tb so the padded
    # bp serves both grids.
    tb, tb_bwd, chunk, ellp = _pick_tiles(
        b2, ell, hd, hh, nbx, has_root, tb, tb_bwd, chunk)
    if waves is None:
        waves = int(os.environ.get("SUREL_LSTM_WAVES", "1"))
    while waves > 1 and (tb % waves or (tb // waves) % 8
                         or tb_bwd % waves or (tb_bwd // waves) % 8):
        waves //= 2          # sub-blocks need sublane-aligned rows
    waves = max(waves, 1)
    bp = -(-b2 // tb) * tb

    def prep(a, fill=0):
        a = a.reshape(b2, ell)
        if bp != b2 or ellp != ell:
            a = jnp.pad(a, [(0, bp - b2), (0, ellp - ell)],
                        constant_values=fill)
        return a.T          # [ellp, bp]: slots on sublanes, rows on lanes

    ko = prep(kown)
    kc = prep(kcross_al)
    mk = prep(mask.astype(jnp.int32))
    roots = None
    if root_own is not None:
        roots = (prep(root_own.astype(jnp.int32)),
                 prep(root_cross.astype(jnp.int32)))
    # Extended operands: u2 = [[U, 0], [0, 1]] lands the slot-valid mask
    # in the hidden rows' last lane (see _be2_of); wi2's matching zero
    # row keeps the gate matmuls exact. jnp.pad's VJP slices dU/dwi back
    # to the original shapes.
    u2 = jnp.pad(u_ext.astype(jnp.float32), [(0, 1), (0, 1)])
    u2 = u2.at[nbx, hd].set(1.0)
    wi2 = jnp.pad(wi.astype(jnp.float32), [(0, 1), (0, 0)])
    out = _klstmt(ko, kc, roots, mk, u2, wi2,
                  wh.astype(jnp.float32),
                  bh.reshape(1, -1).astype(jnp.float32), tb, tb_bwd,
                  ellp, chunk, shift, interpret, waves)
    return out[:b2].reshape(q, b, hh)
