"""Pure-XLA bitonic MERGE of two per-row sorted sequences.

The keys join's dominant op is a `lax.sort` over concat(sorted_v,
sorted_u) rows — a full O(log^2 n) compare-exchange network (~55
stages at n=1024) that cannot exploit the inputs being ALREADY SORTED.
Merging two sorted halves needs only the bitonic MERGE network:
log2(n) stages (10 at n=1024). scripts/probe_roofline.py measured
lax.sort row sorts to be STAGE-COUNT bound (width-insensitive
0.88-1.06 ms at [4096, 128..1024]), so a log-depth network attacks the
per-stage overhead directly.

Two wirings of the same network: `merge_pairs_xla` (rotate-compare-
select over the full row) and `merge_pairs_xor` (r5: partners paired
structurally via static reshapes — i <-> i XOR d on a size-2 axis).
Both are plain jnp; XLA fuses each stage's elementwise chain into one
read+write of the (key, payload) planes. The algorithm matches
ops/pallas/bitonic_merge.py. (The long-standing "poisoning" that kept
all of these opt-in OFF was a module-constant bug, not the network —
see the r5 resolution note below.)

Layout identical to the Pallas wrapper: [ascending a | descending b],
power-of-two sentinel padding (real keys are (node << 1 | tag) with
node < 2^31, so 0xFFFFFFFF sorts after every real key), output sliced
back to la+lb lanes with sentinels sunk to the tail.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

import numpy as np

# A NUMPY scalar, deliberately NOT jnp.uint32(...): a module-level
# device array captured by a traced function becomes an embedded
# constant BUFFER of the compiled executable, and the second execution
# of such a program through the C++ fastpath supplies one fewer buffer
# than compiled ("Execution supplied 11 buffers but compiled program
# expected 12") — reproducible on plain CPU jax (r5; see
# tests/test_merge_net.py::test_merge_join_score_twice). This was the
# r2-r4 "tunnel poisoning": first call ok, second INVALID_ARGUMENT.
SENTINEL = np.uint32(0xFFFFFFFF)

# Join merge impl switch: env SUREL_MERGE_NET or FORCE_MERGE_NET —
#   "1"/"rot": the original rotate-compare-select network (below)
#   "xor":     r5 reformulation — partner pairing via STATIC reshapes
#              (i <-> i XOR d on the pair axis), no rotates, no
#              lane-shift concat chains; built to dodge the r4 poison
#              trigger, numerics identical (tests/test_merge_net.py)
# r5 RESOLUTION of the r2-r4 "merge poisoning": the trigger was never
# the merge network at all. SENTINEL was a module-level jnp.uint32 — a
# DEVICE ARRAY — so every traced program that captured it gained an
# embedded constant buffer, and the SECOND execution of such a program
# dropped that buffer on the C++ fastpath: `INVALID_ARGUMENT:
# Execution supplied 11 buffers but compiled program expected 12`.
# Reproduced on plain CPU jax with no Pallas and no tunnel
# (tests/test_merge_net.py::test_merge_join_score_twice), fixed by
# making SENTINEL a numpy scalar. The r2/r3 attribution to the Pallas
# kernel and the r4 attribution to the rotate-compare-select pattern
# were both wrong — each rewrite changed the code around the same
# poisoned constant. scripts/probe_merge_poison.py remains as the
# hardware bisection harness; default-ON is gated on the r5 hardware
# validation (two clean back-to-back bench runs).
FORCE_MERGE_NET: "bool | str | None" = None


def merge_impl() -> "str | None":
    """'xor' (default ON since r5), 'rot', or None (disabled).

    r5 hardware numbers (v5e, [4096, 301+301] 2-operand row merge):
    lax.sort 1.785 ms, rot 1.751 ms, xor 1.289 ms — the rotate wiring's
    per-stage cost (lane-rotate concat chains) eats its stage-count
    advantage; the static-reshape xor wiring keeps it (x1.38 over the
    sort). Default ON after the poison root-cause fix (SENTINEL note
    below) passed repeated-execution probes and back-to-back bench runs;
    SUREL_MERGE_NET=0 restores the lax.sort merge."""
    import os

    v = FORCE_MERGE_NET
    if v is None:
        v = os.environ.get("SUREL_MERGE_NET")
    if v in (None, "", "xor"):
        return "xor"
    if v in (False, "0"):
        return None
    if v in (True, "1", "rot"):
        return "rot"
    raise ValueError(f"SUREL_MERGE_NET={v!r}: want '', '0', '1', "
                     "'rot', or 'xor'")


def merge_enabled() -> bool:
    return merge_impl() is not None


def _next_pow2(x: int) -> int:
    return 1 << max(x - 1, 1).bit_length()


def _rot_left(x: jax.Array, s: int) -> jax.Array:
    if s == 0:
        return x
    return jnp.concatenate([x[:, s:], x[:, :s]], axis=1)


def merge_pairs_xla(keys_a: jax.Array, pay_a: jax.Array,
                    keys_b: jax.Array, pay_b: jax.Array):
    """Merge per-row sorted (keys_a, keys_b) -> sorted keys + payload.

    keys_*: uint32 [B, L] ascending per row (sentinel-padded rows are
    fine); pay_*: uint32 [B, L]. Returns (keys, pay) [B, la+lb]
    ascending — equal to jax.lax.sort((concat(a, b), concat(pa, pb)),
    num_keys=1) for distinct keys; ties may emerge in either input
    order (the join's consumers are tie-order-invariant: equal packed
    keys cannot pair u with u or v with v because the tag bit differs).
    """
    b, la = keys_a.shape
    lb = keys_b.shape[1]
    s = _next_pow2(max(la, lb))
    n = 2 * s

    def padto(x, width, fill):
        return jnp.pad(x, [(0, 0), (0, width - x.shape[1])],
                       constant_values=fill)

    k = jnp.concatenate(
        [padto(keys_a, s, SENTINEL),
         jnp.flip(padto(keys_b, s, SENTINEL), axis=1)], axis=1)
    p = jnp.concatenate(
        [padto(pay_a, s, 0), jnp.flip(padto(pay_b, s, 0), axis=1)],
        axis=1)
    lanes = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)
    d = n // 2
    while d >= 1:
        kr = _rot_left(k, d)        # partner at i+d (wraps harmlessly)
        kl = _rot_left(k, n - d)    # partner at i-d
        pr = _rot_left(p, d)
        pl = _rot_left(p, n - d)
        low = (lanes & d) == 0
        take = jnp.where(low, kr < k, kl > k)
        k = jnp.where(take, jnp.where(low, kr, kl), k)
        p = jnp.where(take, jnp.where(low, pr, pl), p)
        d //= 2
    return k[:, :la + lb], p[:, :la + lb]


def merge_pairs_xor(keys_a: jax.Array, pay_a: jax.Array,
                    keys_b: jax.Array, pay_b: jax.Array):
    """Same contract as `merge_pairs_xla`, different network wiring.

    Batcher's bitonic-merge stage at distance d compares i with i+d for
    every i whose d bit is clear — i.e. partners are i <-> i XOR d.
    Instead of rotating the whole row (the r4 poison trigger:
    lane-shift concat chains + data-dependent selects on the rotated
    copies), pair the partners STRUCTURALLY: reshape the [B, n] row to
    [B, n/(2d), 2, d] so the partner axis is a static size-2 dimension,
    compare-exchange across it with one shared mask, and reshape back.
    Every op is a static reshape/slice or an elementwise min-select —
    no rotation, no wrapping reads, no per-stage concat of row tails.
    """
    b, la = keys_a.shape
    lb = keys_b.shape[1]
    s = _next_pow2(max(la, lb))
    n = 2 * s

    def padto(x, width, fill):
        return jnp.pad(x, [(0, 0), (0, width - x.shape[1])],
                       constant_values=fill)

    # [ascending a | descending b] is bitonic; sentinels sort to the tail
    k = jnp.concatenate(
        [padto(keys_a, s, SENTINEL),
         jnp.flip(padto(keys_b, s, SENTINEL), axis=1)], axis=1)
    p = jnp.concatenate(
        [padto(pay_a, s, 0), jnp.flip(padto(pay_b, s, 0), axis=1)],
        axis=1)
    d = n // 2
    while d >= 1:
        k4 = k.reshape(b, n // (2 * d), 2, d)
        p4 = p.reshape(b, n // (2 * d), 2, d)
        ka_, kb_ = k4[:, :, 0, :], k4[:, :, 1, :]
        pa_, pb_ = p4[:, :, 0, :], p4[:, :, 1, :]
        swap = ka_ > kb_
        k = jnp.stack([jnp.where(swap, kb_, ka_),
                       jnp.where(swap, ka_, kb_)], axis=2).reshape(b, n)
        p = jnp.stack([jnp.where(swap, pb_, pa_),
                       jnp.where(swap, pa_, pb_)], axis=2).reshape(b, n)
        d //= 2
    return k[:, :la + lb], p[:, :la + lb]


MERGE_FNS = {"rot": merge_pairs_xla, "xor": merge_pairs_xor}


def merge_pairs(keys_a, pay_a, keys_b, pay_b, impl: "str | None" = None):
    """Dispatch to the selected merge network (default: merge_impl())."""
    return MERGE_FNS[impl or merge_impl()](keys_a, pay_a, keys_b, pay_b)
