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
narrow-minor layout. The trick: every unpacked feature is LINEAR in the
bits of the key, so

    f(k) @ W1  ==  bits(k) @ (E @ W1)  ==  bits(k) @ U

with E the constant [num_bits, ncol] bit-expansion matrix
(E[start_j + i, j] = 2^i / num_walks). The kernel expands key bits in
VMEM and feeds the MXU one [rows, NB] @ [NB, H] matmul per side; the
bias rides as an always-one bit column (U row = b1) and the slot mask as
an invalid-slot column (U row = -1e9, so masked slots relu to exactly 0
with zero gradient). The custom-VJP backward recomputes bits from the
keys (32x smaller than the activations) and contracts dU = bits^T @ dz
on the MXU in the same pass; dW1 = E^T dU and db1 fall out of the
wrapper's U construction by ordinary autodiff. Nothing row-sized ever
reaches HBM.

Only valid for field layouts that fit the lo word (enc_field_layout
total <= 32 bits — every published config); callers fall back to the
XLA path otherwise.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1e9      # masked-slot logit offset (relu clamps to 0)


def key_expand_matrix(num_walks: int, num_steps: int) -> np.ndarray:
    """Constant E [num_bits, ncol] with f(k) == bits(k) @ E.

    bits(k)[i] = (k >> i) & 1 for i in 0..lead_bit; column 0 is the root
    indicator (feature = root_bit, the num_walks normalization cancels),
    columns 1..num_steps the landing counts / num_walks."""
    from surel_plus_tpu.ops.walk import enc_field_layout

    shift, starts, lead_bit = enc_field_layout(num_walks, num_steps)
    if lead_bit >= 32:
        raise ValueError("key_expand_matrix requires a lo-word layout")
    e = np.zeros((lead_bit + 1, num_steps + 1), np.float32)
    e[lead_bit, 0] = 1.0
    for j in range(1, num_steps + 1):
        for i in range(shift):
            e[starts[j] + i, j] = float(1 << i) / num_walks
    return e


def _bits_ext(kv, inv, nb):
    """[nb+2, R] float32: key bits | invalid-slot | always-one, for a
    lane-dense row-vector kv [R] (R = TB*L slots of one endpoint).

    Bits land on SUBLANES via a broadcast + sublane-varying iota — the
    layout Mosaic can build without any lane<->sublane relayout (a
    [R, nb] orientation would need one, which Mosaic rejects)."""
    r = kv.shape[0]
    kb = jnp.broadcast_to(kv[None, :], (nb, r))
    shifts = jax.lax.broadcasted_iota(jnp.uint32, (nb, r), 0)
    # Mosaic has no uint32->f32 cast; the 0/1 bits are exact via int32
    bits = ((kb >> shifts) & jnp.uint32(1)).astype(
        jnp.int32).astype(jnp.float32)
    return jnp.concatenate(
        [bits, inv[None, :], jnp.ones((1, r), jnp.float32)], axis=0)


# contraction over the bit axis (sublanes of both operands): be^T @ u
_CONTRACT_BITS = (((0,), (0,)), ((), ()))


def _z_of(kv, inv, u, nbx):
    be = _bits_ext(kv, inv, nbx - 2)
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


def _fwd_kernel(ko_ref, mo_ref, kc_ref, mc_ref, u_ref, out_ref):
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
    _, zc = _z_of(kc_ref[0], jnp.zeros((tb * ellc,), jnp.float32), u, nbx)
    rc = jnp.maximum(zc, 0.0)                        # [TB*ellc, H]
    for pi in range(p):
        _, z = _z_of(ko_ref[pi],
                     1.0 - mo_ref[pi].astype(jnp.float32), u, nbx)
        s = jnp.maximum(z, 0.0).reshape(tb, ello, h).sum(axis=1)
        sel = _group_sel(mc_ref[pi], tb, ellc)
        out_ref[pi] = s + jnp.dot(sel, rc,
                                  preferred_element_type=jnp.float32)


def _bwd_kernel(ko_ref, mo_ref, kc_ref, mc_ref, u_ref, g_ref, du_ref):
    i = pl.program_id(0)
    p = ko_ref.shape[0]
    nbx, h = u_ref.shape
    tb = g_ref.shape[1]
    u = u_ref[:]
    ello = ko_ref.shape[1] // tb
    ellc = kc_ref.shape[1] // tb
    bec, zc = _z_of(kc_ref[0], jnp.zeros((tb * ellc,), jnp.float32),
                    u, nbx)
    gc = None
    acc = None
    for pi in range(p):
        gb = jnp.broadcast_to(
            g_ref[pi][:, None, :], (tb, ello, h)).reshape(tb * ello, h)
        be, z = _z_of(ko_ref[pi],
                      1.0 - mo_ref[pi].astype(jnp.float32), u, nbx)
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


def _specs(p, tb, ello, ellc, nbx, h):
    blk = lambda shape, imap: pl.BlockSpec(shape, imap,
                                           memory_space=pltpu.VMEM)
    ins = [blk((p, tb * ello), lambda i: (0, i)),
           blk((p, tb * ello), lambda i: (0, i)),
           blk((1, tb * ellc), lambda i: (0, i)),
           blk((p, tb * ellc), lambda i: (0, i)),
           blk((nbx, h), lambda i: (0, 0))]
    out = blk((p, tb, h), lambda i: (0, i, 0))
    dub = blk((nbx, h), lambda i: (0, 0))
    gin = blk((p, tb, h), lambda i: (0, i, 0))
    return ins, out, dub, gin


def _pallas_fwd(ko, mo, kc, mc, u, tb, ello, ellc, interpret):
    p = ko.shape[0]
    b = ko.shape[1] // ello
    nbx, h = u.shape
    ins, out, _, _ = _specs(p, tb, ello, ellc, nbx, h)
    return pl.pallas_call(
        _fwd_kernel,
        grid=(b // tb,),
        in_specs=ins,
        out_specs=out,
        out_shape=jax.ShapeDtypeStruct((p, b, h), jnp.float32),
        interpret=interpret,
    )(ko, mo, kc, mc, u)


def _pallas_bwd(ko, mo, kc, mc, u, g, tb, ello, ellc, interpret):
    p = ko.shape[0]
    b = ko.shape[1] // ello
    nbx, h = u.shape
    ins, _, dub, gin = _specs(p, tb, ello, ellc, nbx, h)
    return pl.pallas_call(
        _bwd_kernel,
        grid=(b // tb,),
        in_specs=ins + [gin],
        out_specs=dub,
        out_shape=jax.ShapeDtypeStruct((nbx, h), jnp.float32),
        interpret=interpret,
    )(ko, mo, kc, mc, u, g)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def _fused(ko, mo, kc, mc, u, tb, ello, ellc, interpret):
    return _pallas_fwd(ko, mo, kc, mc, u, tb, ello, ellc, interpret)


def _fused_fwd(ko, mo, kc, mc, u, tb, ello, ellc, interpret):
    return (_pallas_fwd(ko, mo, kc, mc, u, tb, ello, ellc, interpret),
            (ko, mo, kc, mc, u))


def _fused_bwd(tb, ello, ellc, interpret, res, g):
    ko, mo, kc, mc, u = res
    du = _pallas_bwd(ko, mo, kc, mc, u, g.astype(jnp.float32), tb,
                     ello, ellc, interpret)
    f0 = lambda a: np.zeros(a.shape, jax.dtypes.float0)
    return f0(ko), f0(mo), f0(kc), f0(mc), du


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
                         u_ext: jax.Array, tb: int = 8,
                         interpret: bool | None = None) -> jax.Array:
    """Masked set-sum of both sides' hidden activations -> [Q, B, H] f32.

    kown [Q, B, Lo]: uint32 packed lo keys, mask_own [Q, B, Lo] bool.
    kcross [B, Lc]: ONE shared uint32 cross plane in merged-sort order
    (join.py want_sorted; Lc = 2L) — it holds every endpoint's matches at
    disjoint positions, selected per endpoint by mask_cross [Q, B, Lc].
    Set sums are order-invariant, so the un-sort pass this replaces is
    dead code, and the shared plane's hidden activations are computed
    once for all Q endpoints. u_ext: float32 [num_bits + 2, H] =
    concat(E @ W1, [-1e9 row], [b1 row]) — see key_expand_matrix.
    Pads B to the program tile internally (padded sets are masked out)."""
    if interpret is None:
        interpret = _default_interpret()
    q, b, _ = kown.shape
    bp = -(-b // tb) * tb
    ko, ello = _pad_flatten(kown, tb, bp)
    mo, _ = _pad_flatten(mask_own.astype(jnp.int32), tb, bp)
    kc, ellc = _pad_flatten(kcross[None], tb, bp)    # [1, B*Lc]
    mc, _ = _pad_flatten(mask_cross.astype(jnp.int32), tb, bp)
    out = _fused(ko, mo, kc, mc, u_ext, tb, ello, ellc, interpret)
    return out[:, :b]
