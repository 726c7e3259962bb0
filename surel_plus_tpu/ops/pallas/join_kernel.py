"""Pallas TPU kernel: SpJoin cross-lookup via in-VMEM equality contraction.

For each query pair the join must find, for every node of set A, its
payload in sorted set B (0 if absent). The XLA path uses a sort-based merge
(ops/join.py:_cross_lookup_multi); this kernel instead materializes the
[L, L] equality mask entirely in VMEM and contracts it against the payload
vector on the MXU — zero HBM traffic beyond the row tiles themselves, and
no sorting networks:

    cross[i] = sum_j (a[i] == b[j]) * payload_b[j]

Payload words are split into 16-bit halves so the f32 MXU contraction is
exact (each row matches at most one j, and halves are < 2^16).

Grid: one program per ROWS-row tile of the batch. VMEM per program:
ROWS * L * L * 4B for the mask (e.g. 8 * 301 * 301 * 4 = 2.9 MB).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from surel_plus_tpu.ops.walk import INT32_MAX

ROWS = 8  # batch rows per program


def _join_kernel(na_ref, nb_ref, hib_ref, lob_ref, chi_ref, clo_ref):
    na = na_ref[:]                     # [R, L] int32
    nb = nb_ref[:]
    hib = hib_ref[:]                   # [R, L] uint32 (bitcast as int32)
    lob = lob_ref[:]

    eq = (na[:, :, None] == nb[:, None, :]) & \
        (na[:, :, None] != INT32_MAX)
    eq_f = eq.astype(jnp.float32)      # [R, L, L]

    def contract(payload_u32):
        # split into exact-in-f32 16-bit halves (cast via int32: Mosaic
        # has no uint32<->f32 casts; halves are < 2^16 so int32 is safe)
        hi16 = (payload_u32 >> jnp.uint32(16)).astype(jnp.int32) \
            .astype(jnp.float32)
        lo16 = (payload_u32 & jnp.uint32(0xFFFF)).astype(jnp.int32) \
            .astype(jnp.float32)
        halves = jnp.stack([hi16, lo16], axis=-1)   # [R, L, 2]
        out = jax.lax.dot_general(
            eq_f, halves,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)      # [R, L, 2]
        hi = out[:, :, 0].astype(jnp.int32).astype(jnp.uint32)
        lo = out[:, :, 1].astype(jnp.int32).astype(jnp.uint32)
        return (hi << jnp.uint32(16)) | lo

    chi_ref[:] = contract(hib.astype(jnp.uint32))
    clo_ref[:] = contract(lob.astype(jnp.uint32))


@functools.partial(jax.jit, static_argnames=("interpret",))
def pallas_cross_lookup_pair(nodes_a: jax.Array, nodes_b: jax.Array,
                             hi_b: jax.Array, lo_b: jax.Array,
                             interpret: bool = False):
    """Cross-lookup both key words: [B, L] tiles -> (cross_hi, cross_lo).

    B must be a multiple of ROWS (callers pad the batch).
    """
    B, L = nodes_a.shape
    assert B % ROWS == 0, (B, ROWS)
    grid = (B // ROWS,)
    row_spec = pl.BlockSpec((ROWS, L), lambda i: (i, 0),
                            memory_space=pltpu.ANY if interpret
                            else pltpu.VMEM)
    return pl.pallas_call(
        _join_kernel,
        grid=grid,
        in_specs=[row_spec, row_spec, row_spec, row_spec],
        out_specs=(row_spec, row_spec),
        out_shape=(jax.ShapeDtypeStruct((B, L), jnp.uint32),
                   jax.ShapeDtypeStruct((B, L), jnp.uint32)),
        interpret=interpret,
    )(nodes_a, nodes_b, hi_b, lo_b)
