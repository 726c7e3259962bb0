"""Pallas TPU kernel: bitonic merge of two per-row sorted sequences.

The keys join's dominant op is `lax.sort` over concat(sorted_v,
sorted_u) rows (ops/join.py:_cross_lookup_bidir_multi) — XLA's sort is
a full O(log^2 n) compare-exchange network (~55 stages at n=602) that
cannot exploit the inputs being ALREADY SORTED. Merging two sorted
halves needs only the bitonic MERGE network: log2(n) stages (10 at
n=1024) of distance-d compare-exchanges, each a lane roll + select.

The wrapper arranges [ascending a | descending b] (the descending flip
happens OUTSIDE the kernel in XLA — lane reversal inside Mosaic is a
relayout risk), pads each half to a power of two with 0xFFFFFFFF
sentinels (they sort after every real key: real keys are
(node << 1 | tag) with node < 2^31), and slices the merged output back
to the real width — sentinels sink to the tail, so the first
len(a)+len(b) lanes hold every real element in ascending order.

One uint32 payload rides along (the join's combined payload operand).
At stage distance d, position i with bit d clear takes
min(x[i], x[i+d]) and its partner takes the max — i+d never crosses
the array edge for selected positions, so the circular wrap of
pltpu.roll is harmless.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import numpy as np

# numpy scalar, NOT jnp.uint32: a module-level device array traced into
# a jitted program becomes an embedded constant buffer, and the second
# execution of that program drops it ("supplied 11 buffers but expected
# 12") — the actual root cause of the r2-r4 "merge poisoning"; see
# ops/merge_net.py.
SENTINEL = np.uint32(0xFFFFFFFF)


def _merge_kernel(n, k_ref, p_ref, ks_ref, ps_ref):
    k = k_ref[:]
    p = p_ref[:]
    lanes = jax.lax.broadcasted_iota(jnp.int32, k.shape, 1)

    def rot_left(x, s):
        # lane rotation via slice+concat (plain vector ops)
        return jnp.concatenate([x[:, s:], x[:, :s]], axis=1)

    d = n // 2
    while d >= 1:
        kr = rot_left(k, d)          # partner at i+d
        kl = rot_left(k, n - d)      # partner at i-d
        pr = rot_left(p, d)
        pl_ = rot_left(p, n - d)
        low = (lanes & d) == 0
        # boolean logic, not where-on-bools (Mosaic lacks the i8->i1
        # truncation that select over mask vectors lowers to)
        take = (low & (kr < k)) | (~low & (kl > k))
        k = jnp.where(take, jnp.where(low, kr, kl), k)
        p = jnp.where(take, jnp.where(low, pr, pl_), p)
        d //= 2
    ks_ref[:] = k
    ps_ref[:] = p


def _next_pow2(x: int) -> int:
    return 1 << max(x - 1, 1).bit_length()


def _default_interpret() -> bool:
    return jax.default_backend() not in ("tpu",)


# Opt-in switch for the joins' merge impl (None/False = lax.sort).
#
# The kernel is bit-exact vs lax.sort in every configuration it runs
# (tests/test_bitonic_merge.py; standalone TPU runs at B=4096, L=301),
# BUT on the axon-tunneled v5e runtime a program containing it poisons
# the device after one successful execution whenever ANOTHER
# kernel-bearing executable ran earlier in the process: the second
# invocation (and every TPU op after it) fails with INVALID_ARGUMENT.
# Reproduced deterministically with scripts/_probe_merge_model2.py;
# unaffected by tile size (256/64), roll implementation (pltpu.roll vs
# slice+concat), or dimension_semantics=("arbitrary",). The same
# sequence with lax.sort is stable, so the default stays off until this
# can be revalidated on a non-tunneled TPU runtime.
FORCE_BITONIC: bool | None = None


def bitonic_enabled() -> bool:
    if FORCE_BITONIC is not None:
        return FORCE_BITONIC
    return False


def bitonic_merge_pairs(keys_a: jax.Array, pay_a: jax.Array,
                        keys_b: jax.Array, pay_b: jax.Array,
                        tb: int = 64,
                        interpret: bool | None = None):
    """Merge per-row sorted (keys_a, keys_b) -> sorted keys + payload.

    keys_*: uint32 [B, L] ascending per row (sentinel-padded rows fine);
    pay_*: uint32 [B, L]. Returns (keys, pay) [B, 2L] ascending — equal
    to jax.lax.sort((concat(a, b), concat(pa, pb)), num_keys=1)."""
    if interpret is None:
        interpret = _default_interpret()
    b, la = keys_a.shape
    lb = keys_b.shape[1]
    s = _next_pow2(max(la, lb))
    n = 2 * s

    def padto(x, width, fill):
        return jnp.pad(x, [(0, 0), (0, width - x.shape[1])],
                       constant_values=fill)

    kb = jnp.concatenate(
        [padto(keys_a, s, SENTINEL),
         jnp.flip(padto(keys_b, s, SENTINEL), axis=1)], axis=1)
    pb = jnp.concatenate(
        [padto(pay_a, s, 0), jnp.flip(padto(pay_b, s, 0), axis=1)],
        axis=1)
    tb = min(tb, b)
    bp = -(-b // tb) * tb
    if bp != b:
        kb = jnp.pad(kb, [(0, bp - b), (0, 0)],
                     constant_values=SENTINEL)
        pb = jnp.pad(pb, [(0, bp - b), (0, 0)])
    blk = lambda shape, imap: pl.BlockSpec(shape, imap,
                                           memory_space=pltpu.VMEM)
    ks, ps = pl.pallas_call(
        functools.partial(_merge_kernel, n),
        grid=(bp // tb,),
        in_specs=[blk((tb, n), lambda i: (i, 0)),
                  blk((tb, n), lambda i: (i, 0))],
        out_specs=(blk((tb, n), lambda i: (i, 0)),
                   blk((tb, n), lambda i: (i, 0))),
        out_shape=(jax.ShapeDtypeStruct((bp, n), jnp.uint32),
                   jax.ShapeDtypeStruct((bp, n), jnp.uint32)),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(kb, pb)
    return ks[:b, :la + lb], ps[:b, :la + lb]
