"""Pallas TPU kernel: fused key-unpack + hidden layer + masked set-sum.

The train step's hot op (models/net.py, aggregate-before-project) is

    out[q, b] = sum_l mask[q,b,l] * ( relu(f(kown[q,b,l]) @ W1 + b1)
                                    + relu(f(kcross[q,b,l]) @ W1 + b1) )

where f() unpacks a packed landing-count key into its num_steps+1
normalized count features (ops/join.py:unpack_key_features, reference
main.py:174). XLA executes this as unpack -> [rows, ncol] materialize ->
matmul -> [rows, H] materialize -> reduce, and its backward materializes
[rows, H] again — measured 6.7 ms of a 13.6 ms train step at B=4096,
L=301, H=96 (scripts/probe_bwd2.py). Worse, any [rows, ncol] operand has
a ~5-wide minor dimension, which TPU tiling pads to 128 lanes — a naive
Pallas port of that dataflow measured 2.6x SLOWER than XLA
(scripts/probe_fused_hidden.py, r2).

This kernel never materializes either tensor and never touches a
narrow-minor layout. It unpacks the ncol fields directly onto SUBLANES
(row i = (k >> i*shift) & mask via one broadcast + iota — the lo-word
layout's field starts are uniformly spaced) and feeds the MXU one
[ncol+2, rows]^T @ [ncol+2, H] matmul per side; the bias rides as an
always-one row (U row = b1) and the slot mask as an invalid-slot row
(U row = -1e9, so masked slots relu to exactly 0 with zero gradient).
The feature normalization and the reference's column order live in the
U rows (u_core_rows), so dW1/db1 fall out of the wrapper's U
construction by ordinary autodiff; the custom-VJP backward recomputes
the activations from the keys (32x smaller) and contracts
dU = fields @ dz on the MXU in the same pass. Nothing row-sized ever
reaches HBM. (Rejected variants, measured on v5e: a bit-expansion
[num_bits+2, rows] operand — same speed, more code; bf16 compute — no
gain, the z materialization stays f32; MXU group-indicator matmuls for
the own-side set sums — 30% slower than the VPU sublane tree.)

Only valid for field layouts that fit the lo word (enc_field_layout
total <= 32 bits — every published config); callers fall back to the
XLA path otherwise.
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

NEG = -1e9      # masked-slot logit offset (relu clamps to 0)


def _vmem_budget() -> int:
    """Scoped-VMEM limit the fused_fits estimate is compared against.
    Mosaic's stack limit is 16 MB/core; the estimate's coefficients are
    calibrated on hardware observations (see fused_fits), so the margin
    lives in them, not here."""
    return int(os.environ.get("SUREL_HSUM_VMEM_BUDGET", 16 * 2**20))


def fused_fits(ell: int, lc: int, h: int, q: int = 2,
               tb: int = 8, w_own: float | None = None,
               w_cross: float = 1.4) -> bool:
    """Whether a fused kernel's z-plane working set fits scoped VMEM
    at the minimum legal row tile (tb=8 — the [q, tb, h] output block's
    sublane dim must be %8, so tb cannot shrink further; in-kernel
    row/slot chunking is also out, because chunk slices carry lane
    offsets that Mosaic's concatenate rejects, "result/input offset
    mismatch on non-concat dimension" — both measured on v5e r3). The
    footprint is the [tb*ell(c), 128-lane] f32 hidden planes, weighted
    per kernel:

    * set-sum (default w_own=q, w_cross=1.4): calibrated on three v5e
      observations at M=200 (slots=801) — q=4 OOMs at a measured
      18.04 MB scoped allocation; q=2 compiles and runs fused end to
      end (178.7k q/s train). Every link config (q=2, L<=304) ~6 MB.
    * attn pool (callers pass w_own=w_cross=3.5): its backward keeps
      ~7 slot-aligned planes alive (z both sides, softmax weights and
      their VJP, pooled-grad broadcast) — measured 22.51 MB OOM at
      M=200/q=2 where the estimate gives 22.9 MB; link shapes ~8.7 MB
      run (bench.py's attn rows).

    Callers fall back to the XLA path when this returns False
    (models/net.py, models/honet.py)."""
    step = 128 // math.gcd(tb, 128)
    ello = -(-ell // step) * step
    ellc = -(-lc // step) * step
    lp = -(-h // 128) * 128
    if w_own is None:
        w_own = float(q)
    est = 4 * lp * tb * (w_own * ello + w_cross * ellc)
    return est <= _vmem_budget()


def u_core_rows(w1: jax.Array, num_walks: int, num_steps: int) -> jax.Array:
    """W1's rows permuted/scaled to match the kernel's field order.

    The kernel extracts row i as field (k >> i*shift) & mask — i.e.
    column num_steps-i of the encoding for i < num_steps, the root bit
    for i == num_steps (uniform shifts, enc_field_layout pads only at
    the 32-bit boundary, which a lo-word layout never reaches). The
    1/num_walks feature normalization (main.py:174) rides on the weight
    rows; the root column's normalization cancels."""
    from surel_plus_tpu.ops.walk import enc_field_layout

    shift, starts, lead_bit = enc_field_layout(num_walks, num_steps)
    if lead_bit > 32:
        raise ValueError(
            "u_core_rows requires the count fields in the lo word")
    assert lead_bit == num_steps * shift  # uniform spacing below bit 32
    perm = list(range(num_steps, 0, -1))
    return jnp.concatenate(
        [w1[perm, :].astype(jnp.float32) / num_walks,
         w1[0:1, :].astype(jnp.float32)], axis=0)


def _fields_ext(kv, inv, shift, ncol, root=None):
    """[ncol+2, R] float32: unpacked fields | invalid-slot | always-one,
    for a lane-dense row-vector kv [R] (R = TB*L slots of one endpoint).

    Fields land on SUBLANES via a broadcast + sublane-varying iota-scaled
    shift — the layout Mosaic can build without any lane<->sublane
    relayout (a [R, ncol] orientation would need one, which Mosaic
    rejects). Row i holds (k >> i*shift) & (2^shift - 1) for i < ncol-1;
    the last (root) row is (k >> (ncol-1)*shift) & 1, or the given
    int32 0/1 `root` plane for lead-in-hi layouts whose root bit lives
    outside the lo word (ops/join.py)."""
    r = kv.shape[0]
    nf = ncol if root is None else ncol - 1
    kb = jnp.broadcast_to(kv[None, :], (nf, r))
    ri = jax.lax.broadcasted_iota(jnp.uint32, (nf, r), 0)
    fm = jnp.uint32((1 << shift) - 1)
    if root is None:
        fm = jnp.where(ri == ncol - 1, jnp.uint32(1), fm)
    # Mosaic has no uint32->f32 cast; field values are exact via int32
    fields = ((kb >> (ri * jnp.uint32(shift))) & fm).astype(
        jnp.int32).astype(jnp.float32)
    rows = [fields]
    if root is not None:
        rows.append(root.astype(jnp.float32)[None, :])
    rows += [inv[None, :], jnp.ones((1, r), jnp.float32)]
    return jnp.concatenate(rows, axis=0)


# contraction over the bit axis (sublanes of both operands): be^T @ u
_CONTRACT_BITS = (((0,), (0,)), ((), ()))


def _z_of(kv, inv, u, nbx, shift, root=None):
    be = _fields_ext(kv, inv, shift, nbx - 2, root)
    z = jax.lax.dot_general(
        be, u, dimension_numbers=_CONTRACT_BITS,
        preferred_element_type=jnp.float32)          # [TB*ell, H]
    return be, z


def _group_sel(mc, tb, ell):
    """[tb, tb*ell] f32 selector: row t weights slots of set t by mc."""
    tbl = mc.shape[0]
    gi = jax.lax.broadcasted_iota(jnp.int32, (tb, tbl), 0)
    li = jax.lax.broadcasted_iota(jnp.int32, (tb, tbl), 1)
    sel = jnp.where((li // ell) == gi,
                    jnp.broadcast_to(mc[None, :], (tb, tbl)), 0)
    return sel.astype(jnp.float32)


def _fwd_kernel(shift, has_root, *refs):
    if has_root:
        (ko_ref, mo_ref, kc_ref, mc_ref, ro_ref, rc_ref, u_ref,
         out_ref) = refs
    else:
        ko_ref, mo_ref, kc_ref, mc_ref, u_ref, out_ref = refs
        ro_ref = rc_ref = None
    p = ko_ref.shape[0]
    nbx, h = u_ref.shape
    tb = out_ref.shape[1]
    u = u_ref[:]
    ello = ko_ref.shape[1] // tb
    ellc = kc_ref.shape[1] // tb
    # shared cross plane: the merged-sort order holds BOTH directions'
    # matches disjointly, so its hidden activations are computed once and
    # the per-endpoint sums split out via masked group-sum matmuls (the
    # q-masks also zero the padding, so no NEG column is needed here)
    _, zc = _z_of(kc_ref[0], jnp.zeros((tb * ellc,), jnp.float32), u, nbx,
                  shift, None if rc_ref is None else rc_ref[0])
    rc = jnp.maximum(zc, 0.0)                        # [TB*ellc, H]
    for pi in range(p):
        _, z = _z_of(ko_ref[pi],
                     1.0 - mo_ref[pi].astype(jnp.float32), u, nbx, shift,
                     None if ro_ref is None else ro_ref[pi])
        s = jnp.maximum(z, 0.0).reshape(tb, ello, h).sum(axis=1)
        sel = _group_sel(mc_ref[pi], tb, ellc)
        out_ref[pi] = s + jnp.dot(sel, rc,
                                  preferred_element_type=jnp.float32)


def _bwd_kernel(shift, has_root, *refs):
    if has_root:
        (ko_ref, mo_ref, kc_ref, mc_ref, ro_ref, rc_ref, u_ref, g_ref,
         du_ref) = refs
    else:
        ko_ref, mo_ref, kc_ref, mc_ref, u_ref, g_ref, du_ref = refs
        ro_ref = rc_ref = None
    i = pl.program_id(0)
    p = ko_ref.shape[0]
    nbx, h = u_ref.shape
    tb = g_ref.shape[1]
    u = u_ref[:]
    ello = ko_ref.shape[1] // tb
    ellc = kc_ref.shape[1] // tb
    bec, zc = _z_of(kc_ref[0], jnp.zeros((tb * ellc,), jnp.float32),
                    u, nbx, shift,
                    None if rc_ref is None else rc_ref[0])
    gc = None
    acc = None
    for pi in range(p):
        gb = jnp.broadcast_to(
            g_ref[pi][:, None, :], (tb, ello, h)).reshape(tb * ello, h)
        be, z = _z_of(ko_ref[pi],
                      1.0 - mo_ref[pi].astype(jnp.float32), u, nbx,
                      shift, None if ro_ref is None else ro_ref[pi])
        dz = jnp.where(z > 0, gb, 0.0)
        dup = jnp.dot(be, dz, preferred_element_type=jnp.float32)
        acc = dup if acc is None else acc + dup
        # cross cotangent routed through the group selector: [TBLc, H]
        sel = _group_sel(mc_ref[pi], tb, ellc)
        gpi = jax.lax.dot_general(
            sel, g_ref[pi], dimension_numbers=_CONTRACT_BITS,
            preferred_element_type=jnp.float32)
        gc = gpi if gc is None else gc + gpi
    dzc = jnp.where(zc > 0, gc, 0.0)
    acc += jnp.dot(bec, dzc, preferred_element_type=jnp.float32)

    @pl.when(i == 0)
    def _():
        du_ref[:] = jnp.zeros_like(du_ref)

    du_ref[:] += acc


def _specs(p, tb, ello, ellc, nbx, h, has_root):
    blk = lambda shape, imap: pl.BlockSpec(shape, imap,
                                           memory_space=pltpu.VMEM)
    ins = [blk((p, tb * ello), lambda i: (0, i)),
           blk((p, tb * ello), lambda i: (0, i)),
           blk((1, tb * ellc), lambda i: (0, i)),
           blk((p, tb * ellc), lambda i: (0, i))]
    if has_root:
        ins += [blk((p, tb * ello), lambda i: (0, i)),
                blk((1, tb * ellc), lambda i: (0, i))]
    ins.append(blk((nbx, h), lambda i: (0, 0)))
    out = blk((p, tb, h), lambda i: (0, i, 0))
    dub = blk((nbx, h), lambda i: (0, 0))
    gin = blk((p, tb, h), lambda i: (0, i, 0))
    return ins, out, dub, gin


def _pallas_fwd(ko, mo, kc, mc, roots, u, tb, ello, ellc, shift,
                interpret):
    p = ko.shape[0]
    b = ko.shape[1] // ello
    nbx, h = u.shape
    ins, out, _, _ = _specs(p, tb, ello, ellc, nbx, h, roots is not None)
    args = (ko, mo, kc, mc) + (roots or ()) + (u,)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, shift, roots is not None),
        grid=(b // tb,),
        in_specs=ins,
        out_specs=out,
        out_shape=jax.ShapeDtypeStruct((p, b, h), jnp.float32),
        interpret=interpret,
    )(*args)


def _pallas_bwd(ko, mo, kc, mc, roots, u, g, tb, ello, ellc, shift,
                interpret):
    p = ko.shape[0]
    b = ko.shape[1] // ello
    nbx, h = u.shape
    ins, _, dub, gin = _specs(p, tb, ello, ellc, nbx, h,
                              roots is not None)
    args = (ko, mo, kc, mc) + (roots or ()) + (u, g)
    return pl.pallas_call(
        functools.partial(_bwd_kernel, shift, roots is not None),
        grid=(b // tb,),
        in_specs=ins + [gin],
        out_specs=dub,
        out_shape=jax.ShapeDtypeStruct((nbx, h), jnp.float32),
        interpret=interpret,
    )(*args)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9, 10))
def _fused(ko, mo, kc, mc, roots, u, tb, ello, ellc, shift, interpret):
    return _pallas_fwd(ko, mo, kc, mc, roots, u, tb, ello, ellc, shift,
                       interpret)


def _fused_fwd(ko, mo, kc, mc, roots, u, tb, ello, ellc, shift,
               interpret):
    return (_pallas_fwd(ko, mo, kc, mc, roots, u, tb, ello, ellc, shift,
                        interpret),
            (ko, mo, kc, mc, roots, u))


def _fused_bwd(tb, ello, ellc, shift, interpret, res, g):
    ko, mo, kc, mc, roots, u = res
    du = _pallas_bwd(ko, mo, kc, mc, roots, u, g.astype(jnp.float32),
                     tb, ello, ellc, shift, interpret)
    f0 = lambda a: np.zeros(a.shape, jax.dtypes.float0)
    rz = None if roots is None else tuple(f0(r) for r in roots)
    return f0(ko), f0(mo), f0(kc), f0(mc), rz, du


_fused.defvjp(_fused_fwd, _fused_bwd)


def _default_interpret() -> bool:
    return jax.default_backend() not in ("tpu",)


def _pad_flatten(a, tb, bp, fill=0):
    """Pad L so the flattened (TB, L) lane block is 128-aligned, pad B to
    the program tile, then flatten (B, L) -> lanes: every kernel operand
    stays lane-dense (the kernel splits set boundaries back out on
    sublanes post-matmul). Padded slots are masked -> contribute 0."""
    *lead, b, ell = a.shape
    step = 128 // math.gcd(tb, 128)
    ellp = -(-ell // step) * step
    if bp != b or ellp != ell:
        pad = [(0, 0)] * len(lead) + [(0, bp - b), (0, ellp - ell)]
        a = jnp.pad(a, pad, constant_values=fill)
    return a.reshape(*lead, bp * ellp), ellp


def fused_key_hidden_sum(kown: jax.Array, mask_own: jax.Array,
                         kcross: jax.Array, mask_cross: jax.Array,
                         u_ext: jax.Array, shift: int, tb: int = 8,
                         root_own: jax.Array | None = None,
                         root_cross: jax.Array | None = None,
                         interpret: bool | None = None) -> jax.Array:
    """Masked set-sum of both sides' hidden activations -> [Q, B, H] f32.

    kown [Q, B, Lo]: uint32 packed lo keys, mask_own [Q, B, Lo] bool.
    kcross [B, Lc]: ONE shared uint32 cross plane in merged-sort order
    (join.py want_sorted; Lc = 2L) — it holds every endpoint's matches at
    disjoint positions, selected per endpoint by mask_cross [Q, B, Lc].
    Set sums are order-invariant, so the un-sort pass this replaces is
    dead code, and the shared plane's hidden activations are computed
    once for all Q endpoints. u_ext: float32 [num_bits + 2, H] =
    concat(u_core_rows(W1), [-1e9 row], [b1 row]).
    Pads B to the program tile internally (padded sets are masked out)."""
    if interpret is None:
        interpret = _default_interpret()
    q, b, _ = kown.shape
    bp = -(-b // tb) * tb
    ko, ello = _pad_flatten(kown, tb, bp)
    mo, _ = _pad_flatten(mask_own.astype(jnp.int32), tb, bp)
    kc, ellc = _pad_flatten(kcross[None], tb, bp)    # [1, B*Lc]
    mc, _ = _pad_flatten(mask_cross.astype(jnp.int32), tb, bp)
    roots = None
    if root_own is not None:
        ro, _ = _pad_flatten(root_own.astype(jnp.int32), tb, bp)
        rc, _ = _pad_flatten(root_cross.astype(jnp.int32)[None], tb, bp)
        roots = (ro, rc)
    out = _fused(ko, mo, kc, mc, roots, u_ext, tb, ello, ellc, shift,
                 interpret)
    return out[:, :b]


# ---------------------------------------------------------------------------
# Per-slot variant: emit the PAIR-SUMMED hidden activations [Q, B, L, H]
# instead of set sums — the attn/lstm aggregators need per-slot rows
# (models/net.py). Same fields-on-sublanes trick and custom VJP; the
# cross side must be slot-ALIGNED (JoinedBatch.kcross_al), and no mask
# row is needed: downstream aggregators mask invalid slots themselves,
# and an absent partner's 0-key row contributes relu(b1) exactly like
# the reference's zero encoding row (train.py:33-37).

def _slots_fwd_kernel(shift, has_root, *refs):
    if has_root:
        ko_ref, kc_ref, ro_ref, rc_ref, u_ref, out_ref = refs
    else:
        ko_ref, kc_ref, u_ref, out_ref = refs
        ro_ref = rc_ref = None
    p, tb, ell, h = out_ref.shape
    nbx = u_ref.shape[0]
    u = u_ref[:]
    zeros = jnp.zeros((tb * ell,), jnp.float32)
    for pi in range(p):
        acc = None
        for k_ref, r_ref in ((ko_ref, ro_ref), (kc_ref, rc_ref)):
            _, z = _z_of(k_ref[pi], zeros, u, nbx, shift,
                         None if r_ref is None else r_ref[pi])
            r = jnp.maximum(z, 0.0)
            acc = r if acc is None else acc + r
        out_ref[pi] = acc.reshape(tb, ell, h).astype(out_ref.dtype)


def _slots_bwd_kernel(shift, has_root, *refs):
    if has_root:
        ko_ref, kc_ref, ro_ref, rc_ref, u_ref, g_ref, du_ref = refs
    else:
        ko_ref, kc_ref, u_ref, g_ref, du_ref = refs
        ro_ref = rc_ref = None
    i = pl.program_id(0)
    p, tb, ell, h = g_ref.shape
    nbx = u_ref.shape[0]
    u = u_ref[:]
    zeros = jnp.zeros((tb * ell,), jnp.float32)
    acc = None
    for pi in range(p):
        gf = g_ref[pi].reshape(tb * ell, h)
        for k_ref, r_ref in ((ko_ref, ro_ref), (kc_ref, rc_ref)):
            be, z = _z_of(k_ref[pi], zeros, u, nbx, shift,
                          None if r_ref is None else r_ref[pi])
            dz = jnp.where(z > 0, gf, 0.0)
            dup = jnp.dot(be, dz, preferred_element_type=jnp.float32)
            acc = dup if acc is None else acc + dup

    @pl.when(i == 0)
    def _():
        du_ref[:] = jnp.zeros_like(du_ref)

    du_ref[:] += acc


def _slots_specs(p, tb, ell, nbx, h, has_root):
    blk = lambda shape, imap: pl.BlockSpec(shape, imap,
                                           memory_space=pltpu.VMEM)
    ins = [blk((p, tb * ell), lambda i: (0, i)),
           blk((p, tb * ell), lambda i: (0, i))]
    if has_root:
        ins += [blk((p, tb * ell), lambda i: (0, i)),
                blk((p, tb * ell), lambda i: (0, i))]
    ins.append(blk((nbx, h), lambda i: (0, 0)))
    out = blk((p, tb, ell, h), lambda i: (0, i, 0, 0))
    dub = blk((nbx, h), lambda i: (0, 0))
    return ins, out, dub


def _slots_pallas_fwd(ko, kc, roots, u, tb, ell, shift, out_dtype,
                      interpret):
    p = ko.shape[0]
    b = ko.shape[1] // ell
    nbx, h = u.shape
    ins, out, _ = _slots_specs(p, tb, ell, nbx, h, roots is not None)
    args = (ko, kc) + (roots or ()) + (u,)
    return pl.pallas_call(
        functools.partial(_slots_fwd_kernel, shift, roots is not None),
        grid=(b // tb,),
        in_specs=ins,
        out_specs=out,
        out_shape=jax.ShapeDtypeStruct((p, b, ell, h), out_dtype),
        interpret=interpret,
    )(*args)


def _slots_pallas_bwd(ko, kc, roots, u, g, tb, ell, shift, interpret):
    p = ko.shape[0]
    b = ko.shape[1] // ell
    nbx, h = u.shape
    ins, out, dub = _slots_specs(p, tb, ell, nbx, h, roots is not None)
    args = (ko, kc) + (roots or ()) + (u, g)
    return pl.pallas_call(
        functools.partial(_slots_bwd_kernel, shift, roots is not None),
        grid=(b // tb,),
        in_specs=ins + [out],
        out_specs=dub,
        out_shape=jax.ShapeDtypeStruct((nbx, h), jnp.float32),
        interpret=interpret,
    )(*args)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8))
def _fused_slots(ko, kc, roots, u, tb, ell, shift, out_dtype, interpret):
    return _slots_pallas_fwd(ko, kc, roots, u, tb, ell, shift, out_dtype,
                             interpret)


def _fused_slots_fwd(ko, kc, roots, u, tb, ell, shift, out_dtype,
                     interpret):
    return (_slots_pallas_fwd(ko, kc, roots, u, tb, ell, shift,
                              out_dtype, interpret),
            (ko, kc, roots, u))


def _fused_slots_bwd(tb, ell, shift, out_dtype, interpret, res, g):
    ko, kc, roots, u = res
    du = _slots_pallas_bwd(ko, kc, roots, u, g.astype(jnp.float32), tb,
                           ell, shift, interpret)
    f0 = lambda a: np.zeros(a.shape, jax.dtypes.float0)
    rz = None if roots is None else tuple(f0(r) for r in roots)
    return f0(ko), f0(kc), rz, du


_fused_slots.defvjp(_fused_slots_fwd, _fused_slots_bwd)


def fused_key_hidden_slots(kown: jax.Array, kcross_al: jax.Array,
                           u_ext: jax.Array, shift: int, tb: int = 8,
                           out_dtype=jnp.float32,
                           root_own: jax.Array | None = None,
                           root_cross: jax.Array | None = None,
                           interpret: bool | None = None) -> jax.Array:
    """Pair-summed per-slot hidden activations -> [Q, B, L, H] out_dtype
    (compute stays f32; a bf16 output halves the only HBM write this
    kernel makes — the [Q, B, L, H] tensor the aggregators consume).

    kown/kcross_al: uint32 [Q, B, L] packed lo keys, slot-aligned.
    u_ext: float32 [ncol + 2, H] = concat(u_core_rows(W1), [any row],
    [b1 row]) — the same layout the set-sum wrapper uses; the mask row
    multiplies a zero column here, so its value is irrelevant.
    Invalid slots produce finite garbage the caller must mask."""
    if interpret is None:
        interpret = _default_interpret()
    q, b, ell = kown.shape
    bp = -(-b // tb) * tb
    ko, ellp = _pad_flatten(kown, tb, bp)
    kc, _ = _pad_flatten(kcross_al, tb, bp)
    roots = None
    if root_own is not None:
        ro, _ = _pad_flatten(root_own.astype(jnp.int32), tb, bp)
        rc, _ = _pad_flatten(root_cross.astype(jnp.int32), tb, bp)
        roots = (ro, rc)
    out = _fused_slots(ko, kc, roots, u_ext, tb, ellp, shift,
                       jnp.dtype(out_dtype), interpret)
    return out[:, :b, :ell]


# ---------------------------------------------------------------------------
# Fused attention pooling: keys -> hidden -> scalar gate -> masked
# softmax -> weighted pool, entirely in VMEM. With the projection/value
# folds (models/layers.py AttentionAggregation.folded) the gate is the
# only per-slot consumer, so nothing [.., L, h]-sized ever reaches HBM
# in EITHER direction: the custom-VJP backward recomputes the hidden
# rows from the keys and runs the softmax VJP in-kernel, contracting
# dU/dgate-vector on the MXU.

def _attn_gates(pi, shift, tb, ell, h, nbx, u, gv, ko_ref, kc_ref,
                mo_ref, ro_ref, rc_ref):
    """Recompute (be_own, be_cross, zo, zc, hs, gate) for endpoint pi —
    gate is the raw (pre-softmax) [tb, ell, 1] logit with masked slots
    offset by NEG."""
    zeros = jnp.zeros((tb * ell,), jnp.float32)
    inv = 1.0 - mo_ref[pi].astype(jnp.float32)
    beo, zo = _z_of(ko_ref[pi], inv, u, nbx, shift,
                    None if ro_ref is None else ro_ref[pi])
    bec, zc = _z_of(kc_ref[pi], zeros, u, nbx, shift,
                    None if rc_ref is None else rc_ref[pi])
    # the own-side NEG row already zeroed masked slots' hidden rows;
    # reuse be's (inv | ones) tail rows to add NEG*inv + gconst to
    # the gate without any lane->sublane relayout
    hs = jnp.maximum(zo, 0.0) + jnp.maximum(zc, 0.0)       # [R, H]
    gtail = jnp.concatenate(
        [jnp.full((1, 1), NEG, jnp.float32), gv[h:]], axis=0)
    gate = (jnp.dot(hs, gv[:h], preferred_element_type=jnp.float32)
            + jax.lax.dot_general(
                beo[nbx - 2:], gtail,
                dimension_numbers=_CONTRACT_BITS,
                preferred_element_type=jnp.float32))       # [R, 1]
    return beo, bec, zo, zc, hs, gate.reshape(tb, ell, 1)


def _attn_state(pi, shift, tb, ell, h, nbx, u, gv, ko_ref, kc_ref,
                mo_ref, ro_ref, rc_ref):
    """Recompute (be_own, be_cross, zo, zc, hs, a) for endpoint pi."""
    beo, bec, zo, zc, hs, gate = _attn_gates(
        pi, shift, tb, ell, h, nbx, u, gv, ko_ref, kc_ref, mo_ref,
        ro_ref, rc_ref)
    gate = gate - gate.max(axis=1, keepdims=True)
    e = jnp.exp(gate)
    a = e / e.sum(axis=1, keepdims=True)                   # [tb, ell, 1]
    return beo, bec, zo, zc, hs, a


def _attn_fwd_kernel(shift, has_root, *refs):
    if has_root:
        ko_ref, kc_ref, mo_ref, ro_ref, rc_ref, u_ref, gv_ref, out_ref \
            = refs
    else:
        ko_ref, kc_ref, mo_ref, u_ref, gv_ref, out_ref = refs
        ro_ref = rc_ref = None
    p, tb, h = out_ref.shape
    nbx = u_ref.shape[0]
    ell = ko_ref.shape[1] // tb
    u = u_ref[:]
    gv = gv_ref[:]          # [H + 1, 1]: gate vector | gconst row
    for pi in range(p):
        _, _, _, _, hs, a = _attn_state(pi, shift, tb, ell, h, nbx, u,
                                        gv, ko_ref, kc_ref, mo_ref,
                                        ro_ref, rc_ref)
        out_ref[pi] = (a * hs.reshape(tb, ell, h)).sum(axis=1)


def _attn_bwd_kernel(shift, has_root, *refs):
    if has_root:
        (ko_ref, kc_ref, mo_ref, ro_ref, rc_ref, u_ref, gv_ref, g_ref,
         du_ref, dgv_ref) = refs
    else:
        (ko_ref, kc_ref, mo_ref, u_ref, gv_ref, g_ref, du_ref,
         dgv_ref) = refs
        ro_ref = rc_ref = None
    i = pl.program_id(0)
    p, tb, h = g_ref.shape
    nbx = u_ref.shape[0]
    ell = ko_ref.shape[1] // tb
    u = u_ref[:]
    gv = gv_ref[:]
    du_a = jnp.zeros((nbx, h), jnp.float32)
    dgv_a = jnp.zeros((h + 1, 1), jnp.float32)
    for pi in range(p):
        beo, bec, zo, zc, hs, a = _attn_state(
            pi, shift, tb, ell, h, nbx, u, gv, ko_ref, kc_ref, mo_ref,
            ro_ref, rc_ref)
        hs3 = hs.reshape(tb, ell, h)
        gb = jnp.broadcast_to(g_ref[pi][:, None, :], (tb, ell, h))
        da = (hs3 * gb).sum(axis=2, keepdims=True)         # [tb, ell, 1]
        # softmax VJP within each set: dgate = a * (da - sum a*da)
        dgate = a * (da - (a * da).sum(axis=1, keepdims=True))
        # dhs = a * dout (pool term) + dgate * gvec^T (gate term)
        dhs = (a * gb + dgate * gv[:h].reshape(1, 1, h)
               ).reshape(tb * ell, h)
        dgv_a += jnp.concatenate([
            jax.lax.dot_general(hs, dgate.reshape(tb * ell, 1),
                                dimension_numbers=_CONTRACT_BITS,
                                preferred_element_type=jnp.float32),
            dgate.sum(axis=(0, 1))[None],
        ], axis=0)
        dzo = jnp.where(zo > 0, dhs, 0.0)
        dzc = jnp.where(zc > 0, dhs, 0.0)
        du_a += jnp.dot(beo, dzo, preferred_element_type=jnp.float32)
        du_a += jnp.dot(bec, dzc, preferred_element_type=jnp.float32)

    @pl.when(i == 0)
    def _():
        du_ref[:] = jnp.zeros_like(du_ref)
        dgv_ref[:] = jnp.zeros_like(dgv_ref)

    du_ref[:] += du_a
    dgv_ref[:] += dgv_a


def _attn_specs(q, tb, ellp, nbx, h, has_root):
    blk = lambda shape, imap: pl.BlockSpec(shape, imap,
                                           memory_space=pltpu.VMEM)
    ins = [blk((q, tb * ellp), lambda i: (0, i)),
           blk((q, tb * ellp), lambda i: (0, i)),
           blk((q, tb * ellp), lambda i: (0, i))]
    if has_root:
        ins += [blk((q, tb * ellp), lambda i: (0, i)),
                blk((q, tb * ellp), lambda i: (0, i))]
    ins += [blk((nbx, h), lambda i: (0, 0)),
            blk((h + 1, 1), lambda i: (0, 0))]
    out = blk((q, tb, h), lambda i: (0, i, 0))
    return ins, out, blk


def _attn_pallas_fwd(ko, kc, mo, roots, u, gv, tb, ellp, shift,
                     interpret):
    q = ko.shape[0]
    bp = ko.shape[1] // ellp
    nbx, h = u.shape
    ins, out, _ = _attn_specs(q, tb, ellp, nbx, h, roots is not None)
    args = (ko, kc, mo) + (roots or ()) + (u, gv)
    return pl.pallas_call(
        functools.partial(_attn_fwd_kernel, shift, roots is not None),
        grid=(bp // tb,),
        in_specs=ins,
        out_specs=out,
        out_shape=jax.ShapeDtypeStruct((q, bp, h), jnp.float32),
        interpret=interpret,
    )(*args)


def _attn_pallas_bwd(ko, kc, mo, roots, u, gv, g, tb, ellp, shift,
                     interpret):
    q = ko.shape[0]
    bp = ko.shape[1] // ellp
    nbx, h = u.shape
    ins, out, blk = _attn_specs(q, tb, ellp, nbx, h, roots is not None)
    args = (ko, kc, mo) + (roots or ()) + (u, gv, g)
    return pl.pallas_call(
        functools.partial(_attn_bwd_kernel, shift, roots is not None),
        grid=(bp // tb,),
        in_specs=ins + [out],
        out_specs=(blk((nbx, h), lambda i: (0, 0)),
                   blk((h + 1, 1), lambda i: (0, 0))),
        out_shape=(jax.ShapeDtypeStruct((nbx, h), jnp.float32),
                   jax.ShapeDtypeStruct((h + 1, 1), jnp.float32)),
        interpret=interpret,
    )(*args)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9))
def _fused_attn(ko, kc, mo, roots, u, gv, tb, ellp, shift, interpret):
    return _attn_pallas_fwd(ko, kc, mo, roots, u, gv, tb, ellp, shift,
                            interpret)


def _fused_attn_fwd(ko, kc, mo, roots, u, gv, tb, ellp, shift,
                    interpret):
    return (_attn_pallas_fwd(ko, kc, mo, roots, u, gv, tb, ellp, shift,
                             interpret),
            (ko, kc, mo, roots, u, gv))


def _fused_attn_bwd(tb, ellp, shift, interpret, res, g):
    ko, kc, mo, roots, u, gv = res
    du, dgv = _attn_pallas_bwd(ko, kc, mo, roots, u, gv,
                               g.astype(jnp.float32), tb, ellp, shift,
                               interpret)
    f0 = lambda a: np.zeros(a.shape, jax.dtypes.float0)
    rz = None if roots is None else tuple(f0(r) for r in roots)
    return f0(ko), f0(kc), f0(mo), rz, du, dgv


_fused_attn.defvjp(_fused_attn_fwd, _fused_attn_bwd)


def fused_attn_pool(kown: jax.Array, kcross_al: jax.Array,
                    mask: jax.Array, u_ext: jax.Array, gvec: jax.Array,
                    gconst: jax.Array, shift: int, tb: int = 8,
                    root_own: jax.Array | None = None,
                    root_cross: jax.Array | None = None,
                    chunk: int | None = None,
                    interpret: bool | None = None) -> jax.Array:
    """Masked attention pool over per-slot hidden rows -> [Q, B, H] f32.

    kown/kcross_al: uint32 [Q, B, L] slot-aligned packed keys; mask
    bool [Q, B, L]; u_ext as in fused_key_hidden_sum (its NEG row zeroes
    masked slots' hidden rows AND drives the gate's -inf); gvec [H, 1]
    f32 (the folded gate vector W2 @ wg), gconst [1, 1]. Differentiable
    wrt u_ext/gvec/gconst (in-kernel softmax VJP with hidden rows
    recomputed from the keys).

    Masked slots' gates get +NEG (their softmax weight underflows to 0),
    and sets are never empty, so the weights sum to 1 over valid slots —
    matching AttentionAggregation exactly.

    chunk: slot-chunked execution for shapes whose monolithic working
    set exceeds scoped VMEM (the M=200 attn backward measured 22.51 MB
    on v5e) — see the chunked section below. None = monolithic;
    `attn_pool_chunk` picks a value automatically."""
    if interpret is None:
        interpret = _default_interpret()
    q, b, ell = kown.shape
    h = gvec.shape[0]
    bp = -(-b // tb) * tb
    gv = jnp.concatenate([gvec.astype(jnp.float32),
                          gconst.reshape(1, 1).astype(jnp.float32)],
                         axis=0)
    if chunk is not None and chunk < ell:
        mo3 = mask.astype(jnp.int32)
        roots3 = None
        if root_own is not None:
            roots3 = (root_own.astype(jnp.int32),
                      root_cross.astype(jnp.int32))
        out = _fused_attn_ck(kown, kcross_al, mo3, roots3, u_ext, gv,
                             tb, chunk, shift, interpret)
        return out[:, :b]
    ko, ellp = _pad_flatten(kown, tb, bp)
    kc, _ = _pad_flatten(kcross_al, tb, bp)
    mo, _ = _pad_flatten(mask.astype(jnp.int32), tb, bp)
    roots = None
    if root_own is not None:
        ro, _ = _pad_flatten(root_own.astype(jnp.int32), tb, bp)
        rc, _ = _pad_flatten(root_cross.astype(jnp.int32), tb, bp)
        roots = (ro, rc)
    out = _fused_attn(ko, kc, mo, roots, u_ext, gv, tb, ellp, shift,
                      interpret)
    return out[:, :b]


# ---------------------------------------------------------------------------
# Chunked attention pool — lifts the VMEM gate at wide shapes (VERDICT
# r3 item 3: ppa's M=200/S=4 layout, L=801, where the monolithic
# backward's ~7 slot-aligned planes measure 22.51 MB > 16 MB scoped).
#
# Design: flash-attention-style partial softmax over L-SLICES of the
# key planes, sliced OUTSIDE the kernel (XLA slices of [Q, B, L] are
# cheap and sidestep Mosaic's in-kernel chunk-slice limitation — the
# "offset mismatch on non-concat dimension" note above applies to
# slices of one operand inside a kernel, not to separate pallas_calls
# over pre-sliced operands). Three kernels, each holding only
# chunk-sized planes:
#   * stats (forward): per slice j emit m_j = max gate, s_j = sum
#     exp(gate - m_j), p_j = sum exp(gate - m_j) * hs. XLA combine:
#     m = max_j m_j; sc_j = exp(m_j - m); out = sum(p_j sc_j) /
#     sum(s_j sc_j). One z-pass; (m, s) saved as residuals.
#   * t-pass (backward 1): with the forward's exact (m, s), the true
#     softmax weight a = exp(gate - m)/s is slice-local; emit
#     t_j = sum_l a*da (da = hs·g) and combine t = sum_j t_j — the
#     softmax-VJP coupling term needs full-L t before any dgate.
#   * grad-pass (backward 2): dgate = a*(da - t); accumulate dU/dgv
#     exactly like the monolithic backward, summed across slices.
# Masked / padded slots carry gate+NEG, so exp underflows to 0 exactly
# and fully-masked slices are killed by sc_j = exp(NEG-ish) = 0 — the
# combine is exact, not approximate. Total z recomputation is 3 passes
# (vs 2 monolithic); each slice's working set is ~7 planes of `chunk`
# slots instead of L.


def _attn_cstats_kernel(shift, has_root, *refs):
    if has_root:
        (ko_ref, kc_ref, mo_ref, ro_ref, rc_ref, u_ref, gv_ref, m_ref,
         s_ref, p_ref) = refs
    else:
        ko_ref, kc_ref, mo_ref, u_ref, gv_ref, m_ref, s_ref, p_ref = refs
        ro_ref = rc_ref = None
    p, tb, h = p_ref.shape
    nbx = u_ref.shape[0]
    ell = ko_ref.shape[1] // tb
    u = u_ref[:]
    gv = gv_ref[:]
    for pi in range(p):
        _, _, _, _, hs, gate = _attn_gates(
            pi, shift, tb, ell, h, nbx, u, gv, ko_ref, kc_ref, mo_ref,
            ro_ref, rc_ref)
        m = gate.max(axis=1)                               # [tb, 1]
        e = jnp.exp(gate - m[:, None])                     # [tb, ell, 1]
        m_ref[pi] = m
        s_ref[pi] = e.sum(axis=1)
        p_ref[pi] = (e * hs.reshape(tb, ell, h)).sum(axis=1)


def _attn_ct_kernel(shift, has_root, *refs):
    if has_root:
        (ko_ref, kc_ref, mo_ref, ro_ref, rc_ref, u_ref, gv_ref, m_ref,
         s_ref, g_ref, t_ref) = refs
    else:
        (ko_ref, kc_ref, mo_ref, u_ref, gv_ref, m_ref, s_ref, g_ref,
         t_ref) = refs
        ro_ref = rc_ref = None
    p, tb, h = g_ref.shape
    nbx = u_ref.shape[0]
    ell = ko_ref.shape[1] // tb
    u = u_ref[:]
    gv = gv_ref[:]
    for pi in range(p):
        _, _, _, _, hs, gate = _attn_gates(
            pi, shift, tb, ell, h, nbx, u, gv, ko_ref, kc_ref, mo_ref,
            ro_ref, rc_ref)
        a = (jnp.exp(gate - m_ref[pi][:, None])
             / s_ref[pi][:, None])                         # [tb, ell, 1]
        gb = jnp.broadcast_to(g_ref[pi][:, None, :], (tb, ell, h))
        da = (hs.reshape(tb, ell, h) * gb).sum(axis=2, keepdims=True)
        t_ref[pi] = (a * da).sum(axis=1)                   # [tb, 1]


def _attn_cbwd_kernel(shift, has_root, *refs):
    if has_root:
        (ko_ref, kc_ref, mo_ref, ro_ref, rc_ref, u_ref, gv_ref, m_ref,
         s_ref, t_ref, g_ref, du_ref, dgv_ref) = refs
    else:
        (ko_ref, kc_ref, mo_ref, u_ref, gv_ref, m_ref, s_ref, t_ref,
         g_ref, du_ref, dgv_ref) = refs
        ro_ref = rc_ref = None
    i = pl.program_id(0)
    p, tb, h = g_ref.shape
    nbx = u_ref.shape[0]
    ell = ko_ref.shape[1] // tb
    u = u_ref[:]
    gv = gv_ref[:]
    du_a = jnp.zeros((nbx, h), jnp.float32)
    dgv_a = jnp.zeros((h + 1, 1), jnp.float32)
    for pi in range(p):
        beo, bec, zo, zc, hs, gate = _attn_gates(
            pi, shift, tb, ell, h, nbx, u, gv, ko_ref, kc_ref, mo_ref,
            ro_ref, rc_ref)
        a = (jnp.exp(gate - m_ref[pi][:, None])
             / s_ref[pi][:, None])
        hs3 = hs.reshape(tb, ell, h)
        gb = jnp.broadcast_to(g_ref[pi][:, None, :], (tb, ell, h))
        da = (hs3 * gb).sum(axis=2, keepdims=True)
        dgate = a * (da - t_ref[pi][:, None])
        dhs = (a * gb + dgate * gv[:h].reshape(1, 1, h)
               ).reshape(tb * ell, h)
        dgv_a += jnp.concatenate([
            jax.lax.dot_general(hs, dgate.reshape(tb * ell, 1),
                                dimension_numbers=_CONTRACT_BITS,
                                preferred_element_type=jnp.float32),
            dgate.sum(axis=(0, 1))[None],
        ], axis=0)
        dzo = jnp.where(zo > 0, dhs, 0.0)
        dzc = jnp.where(zc > 0, dhs, 0.0)
        du_a += jnp.dot(beo, dzo, preferred_element_type=jnp.float32)
        du_a += jnp.dot(bec, dzc, preferred_element_type=jnp.float32)

    @pl.when(i == 0)
    def _():
        du_ref[:] = jnp.zeros_like(du_ref)
        dgv_ref[:] = jnp.zeros_like(dgv_ref)

    du_ref[:] += du_a
    dgv_ref[:] += dgv_a


def _attn_cspecs(q, tb, ellp, nbx, h, has_root):
    blk = lambda shape, imap: pl.BlockSpec(shape, imap,
                                           memory_space=pltpu.VMEM)
    nkeys = 5 if has_root else 3
    keys = [blk((q, tb * ellp), lambda i: (0, i)) for _ in range(nkeys)]
    uv = [blk((nbx, h), lambda i: (0, 0)),
          blk((h + 1, 1), lambda i: (0, 0))]
    col = blk((q, tb, 1), lambda i: (0, i, 0))
    mat = blk((q, tb, h), lambda i: (0, i, 0))
    return keys, uv, col, mat, blk


def _attn_chunk_slices(kown, kc_al, mo3, roots3, tb, chunk):
    """L-slices of the [Q, B, L] operands, each pad-flattened to its own
    lane-dense (q, bp*chunkp) layout. Padded slots are masked (fill 0),
    so they behave exactly like masked slots."""
    q, b, ell = kown.shape
    bp = -(-b // tb) * tb
    out = []
    for lo in range(0, ell, chunk):
        sl = slice(lo, min(lo + chunk, ell))
        ko, ellp = _pad_flatten(kown[:, :, sl], tb, bp)
        kc, _ = _pad_flatten(kc_al[:, :, sl], tb, bp)
        mk, _ = _pad_flatten(mo3[:, :, sl], tb, bp)
        rr = None
        if roots3 is not None:
            ro, _ = _pad_flatten(roots3[0][:, :, sl], tb, bp)
            rc, _ = _pad_flatten(roots3[1][:, :, sl], tb, bp)
            rr = (ro, rc)
        out.append((ko, kc, mk, rr, ellp))
    return out, bp


def _attn_ck_stats(kown, kc_al, mo3, roots3, u, gv, tb, chunk, shift,
                   interpret):
    q = kown.shape[0]
    nbx, h = u.shape
    slices, bp = _attn_chunk_slices(kown, kc_al, mo3, roots3, tb, chunk)
    parts = []
    for ko, kc, mk, rr, ellp in slices:
        keys, uv, col, mat, _ = _attn_cspecs(q, tb, ellp, nbx, h,
                                             rr is not None)
        args = (ko, kc, mk) + (rr or ()) + (u, gv)
        parts.append(pl.pallas_call(
            functools.partial(_attn_cstats_kernel, shift, rr is not None),
            grid=(bp // tb,),
            in_specs=keys + uv,
            out_specs=(col, col, mat),
            out_shape=(jax.ShapeDtypeStruct((q, bp, 1), jnp.float32),
                       jax.ShapeDtypeStruct((q, bp, 1), jnp.float32),
                       jax.ShapeDtypeStruct((q, bp, h), jnp.float32)),
            interpret=interpret,
        )(*args))
    m = functools.reduce(jnp.maximum, [mj for mj, _, _ in parts])
    scs = [jnp.exp(mj - m) for mj, _, _ in parts]
    s = sum(sj * sc for (_, sj, _), sc in zip(parts, scs))
    pool = sum(pj * sc for (_, _, pj), sc in zip(parts, scs))
    return pool / s, m, s


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9))
def _fused_attn_ck(kown, kc_al, mo3, roots3, u, gv, tb, chunk, shift,
                   interpret):
    return _attn_ck_stats(kown, kc_al, mo3, roots3, u, gv, tb, chunk,
                          shift, interpret)[0]


def _fused_attn_ck_fwd(kown, kc_al, mo3, roots3, u, gv, tb, chunk,
                       shift, interpret):
    out, m, s = _attn_ck_stats(kown, kc_al, mo3, roots3, u, gv, tb,
                               chunk, shift, interpret)
    return out, (kown, kc_al, mo3, roots3, u, gv, m, s)


def _fused_attn_ck_bwd(tb, chunk, shift, interpret, res, g):
    kown, kc_al, mo3, roots3, u, gv, m, s = res
    g = g.astype(jnp.float32)                              # [q, bp, h]
    q = kown.shape[0]
    nbx, h = u.shape
    slices, bp = _attn_chunk_slices(kown, kc_al, mo3, roots3, tb, chunk)
    t = None
    for ko, kc, mk, rr, ellp in slices:
        keys, uv, col, mat, _ = _attn_cspecs(q, tb, ellp, nbx, h,
                                             rr is not None)
        args = (ko, kc, mk) + (rr or ()) + (u, gv, m, s, g)
        tj = pl.pallas_call(
            functools.partial(_attn_ct_kernel, shift, rr is not None),
            grid=(bp // tb,),
            in_specs=keys + uv + [col, col, mat],
            out_specs=col,
            out_shape=jax.ShapeDtypeStruct((q, bp, 1), jnp.float32),
            interpret=interpret,
        )(*args)
        t = tj if t is None else t + tj
    du = jnp.zeros((nbx, h), jnp.float32)
    dgv = jnp.zeros((h + 1, 1), jnp.float32)
    for ko, kc, mk, rr, ellp in slices:
        keys, uv, col, mat, blk = _attn_cspecs(q, tb, ellp, nbx, h,
                                               rr is not None)
        args = (ko, kc, mk) + (rr or ()) + (u, gv, m, s, t, g)
        du_j, dgv_j = pl.pallas_call(
            functools.partial(_attn_cbwd_kernel, shift, rr is not None),
            grid=(bp // tb,),
            in_specs=keys + uv + [col, col, col, mat],
            out_specs=(blk((nbx, h), lambda i: (0, 0)),
                       blk((h + 1, 1), lambda i: (0, 0))),
            out_shape=(jax.ShapeDtypeStruct((nbx, h), jnp.float32),
                       jax.ShapeDtypeStruct((h + 1, 1), jnp.float32)),
            interpret=interpret,
        )(*args)
        du = du + du_j
        dgv = dgv + dgv_j
    f0 = lambda a: np.zeros(a.shape, jax.dtypes.float0)
    rz = None if roots3 is None else tuple(f0(r) for r in roots3)
    return f0(kown), f0(kc_al), f0(mo3), rz, du, dgv


_fused_attn_ck.defvjp(_fused_attn_ck_fwd, _fused_attn_ck_bwd)


def attn_pool_chunk(ell: int, lc: int, h: int, q: int = 2,
                    tb: int = 8) -> int | None:
    """Slot-chunk size for fused_attn_pool at this shape, or None when
    the monolithic kernels fit (w=3.5 calibration — see fused_fits).
    A non-None result means the fused path is ALWAYS available: the
    chunked kernels hold the same plane set over `chunk` slots, so the
    same calibrated estimate gates each slice."""
    if fused_fits(ell, lc, h, q, tb, w_own=3.5, w_cross=3.5):
        return None
    for chunk in (512, 384, 256, 192, 128, 96, 64, 32, 16):
        if chunk < ell and fused_fits(chunk, chunk, h, q, tb,
                                      w_own=3.5, w_cross=3.5):
            return chunk
    return 8


def fused_key_hidden_sum_split(kown, mask_own, kcross, mask_cross,
                               u_ext, shift, nsplit: int, tb: int = 8,
                               root_own=None, root_cross=None,
                               interpret=None):
    """fused_key_hidden_sum over `nsplit` slot-range parts, summed —
    set sums are order-invariant and each slot lands in exactly one
    part, so the parts' custom VJPs compose under plain addition. This
    lifts the q=4 hyperedge VMEM gate at M=200 (measured 18.04 MB
    monolithic; VERDICT r3 item 4): own [Q, B, L] and the shared cross
    plane [B, Lc] are split independently along their slot axes."""
    lo_all = kown.shape[-1]
    lc_all = kcross.shape[-1]
    # every part needs >= 1 slot on BOTH sides (the kernel has no
    # zero-width blocks); the cap only binds at toy widths / test-forced
    # tiny budgets
    nsplit = max(1, min(nsplit, lo_all, lc_all))
    out = None
    for i in range(nsplit):
        o0, o1 = (lo_all * i) // nsplit, (lo_all * (i + 1)) // nsplit
        c0, c1 = (lc_all * i) // nsplit, (lc_all * (i + 1)) // nsplit
        part = fused_key_hidden_sum(
            kown[..., o0:o1], mask_own[..., o0:o1],
            kcross[..., c0:c1], mask_cross[..., c0:c1], u_ext, shift,
            tb=tb,
            root_own=None if root_own is None else root_own[..., o0:o1],
            root_cross=(None if root_cross is None
                        else root_cross[..., c0:c1]),
            interpret=interpret)
        out = part if out is None else out + part
    return out


def set_sum_splits(ell: int, lc: int, h: int, q: int = 2,
                   tb: int = 8) -> int:
    """Minimal part count for fused_key_hidden_sum_split at this shape
    (1 = monolithic fits).

    q>=4 uses BACKWARD-calibrated weights (x1.75 the forward set): the
    q=4 transpose kernel measured a 27.40 MB scoped allocation where
    the forward calibration estimated 16.08 MB (nsplit=2 at M=200
    S'=3, v5e HW, r4) — the hyperedge backward keeps dz planes for all
    four groups plus the shared cross plane's VJP alive. q=2 keeps the
    forward weights, which hardware runs validate through M=200
    (probe_fused_ab mean:1, probe_hw_parity)."""
    wo, wc = (1.75 * q, 2.45) if q >= 4 else (None, 1.4)
    for nsplit in (1, 2, 3, 4, 6, 8, 12, 16, 24, 32):
        if fused_fits(-(-ell // nsplit), -(-lc // nsplit), h, q, tb,
                      w_own=wo, w_cross=wc):
            return nsplit
    return 64
