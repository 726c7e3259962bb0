"""Pure-XLA bitonic MERGE of two per-row sorted sequences.

The keys join's dominant op is a `lax.sort` over concat(sorted_v,
sorted_u) rows — a full O(log^2 n) compare-exchange network (~55
stages at n=1024) that cannot exploit the inputs being ALREADY SORTED.
Merging two sorted halves needs only the bitonic MERGE network:
log2(n) stages (10 at n=1024). scripts/probe_roofline.py measured
lax.sort row sorts to be STAGE-COUNT bound (width-insensitive
0.88-1.06 ms at [4096, 128..1024]), so a log-depth network attacks the
per-stage overhead directly.

This is the same algorithm as ops/pallas/bitonic_merge.py but in plain
jnp ops (lane shifts via concat slices + selects) — no Mosaic, so it
is immune to the tunneled-runtime poisoning that keeps the Pallas
variant opt-in OFF (see that module's post-mortem). XLA fuses the
compare/select elementwise chain per stage; each stage costs one
read+write of the (key, payload) planes.

Layout identical to the Pallas wrapper: [ascending a | descending b],
power-of-two sentinel padding (real keys are (node << 1 | tag) with
node < 2^31, so 0xFFFFFFFF sorts after every real key), output sliced
back to la+lb lanes with sentinels sunk to the tail.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

SENTINEL = jnp.uint32(0xFFFFFFFF)

# Join merge impl switch: env SUREL_MERGE_NET=1 or FORCE_MERGE_NET —
# opt-in OFF, exactly like the Pallas variant, because of the r4
# hardware finding below.
#
# r4 ROOT-CAUSE ADVANCE (2026-08-19, v5e via the axon tunnel): this
# PURE-XLA merge network reproduces the SAME runtime poisoning that
# kept ops/pallas/bitonic_merge.py disabled — in a fresh process, the
# fused-mean train program with SUREL_MERGE_NET=1 compiles, executes
# its first fit successfully, then the SECOND execution fails with
# `INVALID_ARGUMENT: TPU backend error` at the result pull
# (probe_fused_ab mean:1; the identical process with =0 is stable; the
# chip recovers for subsequent processes). There is NO Mosaic/Pallas
# code on this path, so the r2/r3 attribution of the poison to the
# Pallas kernel was wrong: the trigger is the log-depth
# rotate-compare-select MERGE NETWORK pattern itself (large lane-shift
# concat chains + data-dependent selects) interacting with the
# runtime, not the kernel language. See scripts/probe_merge_poison.py
# for the bisection harness and CLAUDE.md for the session protocol
# (poison experiments LAST — a past debugging session took the relay
# down for a day).
FORCE_MERGE_NET: bool | None = None


def merge_enabled() -> bool:
    import os

    if FORCE_MERGE_NET is not None:
        return FORCE_MERGE_NET
    env = os.environ.get("SUREL_MERGE_NET")
    if env is not None:
        return env == "1"
    return False


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
