"""TPU probe: SpJoin implementation shootout (dev tool).

Variants over [B, L] sorted padded rows:
  bsearch  — current rows_searchsorted (gather-heavy)
  merge    — concat + two device sorts (compare-exchange, no gathers)
  eqmm     — equality outer-product contracted on the MXU
"""
import os
import sys
import time

import numpy as np

t00 = time.time()
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from surel_plus_tpu.ops.walk import INT32_MAX, rows_searchsorted


def log(m):
    print(f"[{time.time()-t00:6.1f}s] {m}", flush=True)


B, L = 4096, 301
rng = np.random.default_rng(0)


def make_rows():
    nodes = np.sort(rng.integers(0, 100_000, size=(B, L)), axis=1)
    # ensure strictly increasing (unique) then pad tail
    nodes = nodes + np.arange(L)[None, :]
    sizes = rng.integers(L // 2, L, size=B)
    mask = np.arange(L)[None, :] < sizes[:, None]
    nodes = np.where(mask, nodes, INT32_MAX)
    eidx = np.where(mask, rng.integers(1, 1000, size=(B, L)), 0)
    return (jnp.asarray(nodes.astype(np.int32)),
            jnp.asarray(eidx.astype(np.int32)))


na, ea = make_rows()
nb, eb = make_rows()


@jax.jit
def join_bsearch(na, nb, eb):
    pos = rows_searchsorted(nb, na)
    pos = jnp.minimum(pos, L - 1)
    hit = (jnp.take_along_axis(nb, pos, axis=1) == na) & (na != INT32_MAX)
    return jnp.where(hit, jnp.take_along_axis(eb, pos, axis=1), 0)


@jax.jit
def join_merge(na, nb, eb):
    # concat with origin tags; sort by (node, origin); A-element's partner
    # B-element (if any) is its immediate left neighbor
    vals = jnp.concatenate([nb, na], axis=1)              # B first (tag 0)
    orig = jnp.concatenate([jnp.zeros((B, L), jnp.int32),
                            jnp.ones((B, L), jnp.int32)], axis=1)
    payload = jnp.concatenate([eb, jnp.zeros((B, L), jnp.int32)], axis=1)
    pos = jnp.broadcast_to(jnp.arange(2 * L, dtype=jnp.int32)[None, :],
                           (B, 2 * L))
    sv, so, sp, spos = jax.lax.sort((vals, orig, payload, pos), num_keys=2)
    prev_same = jnp.concatenate([
        jnp.zeros((B, 1), bool),
        (sv[:, 1:] == sv[:, :-1]) & (so[:, 1:] == 1) & (so[:, :-1] == 0)],
        axis=1)
    prev_payload = jnp.concatenate([jnp.zeros((B, 1), jnp.int32),
                                    sp[:, :-1]], axis=1)
    cross_sorted = jnp.where(prev_same & (sv != INT32_MAX), prev_payload, 0)
    # un-sort: route back by original position
    _, back = jax.lax.sort((spos, cross_sorted), num_keys=1)
    return back[:, L:]


@jax.jit
def join_eqmm(na, nb, eb):
    def chunk(carry, idx):
        a = jax.lax.dynamic_slice_in_dim(na, idx * 512, 512, axis=0)
        b = jax.lax.dynamic_slice_in_dim(nb, idx * 512, 512, axis=0)
        e = jax.lax.dynamic_slice_in_dim(eb, idx * 512, 512, axis=0)
        eq = (a[:, :, None] == b[:, None, :]) & (a[:, :, None] != INT32_MAX)
        cross = jax.lax.dot_general(
            eq.astype(jnp.bfloat16), e.astype(jnp.bfloat16)[:, :, None],
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)[:, :, 0]
        return carry, cross.astype(jnp.int32)

    _, out = jax.lax.scan(chunk, None, jnp.arange(B // 512, dtype=jnp.int32))
    return out.reshape(B, L)


ref = None
for name, fn in (("bsearch", join_bsearch), ("merge", join_merge),
                 ("eqmm", join_eqmm)):
    t0 = time.time()
    out = fn(na, nb, eb)
    jax.block_until_ready(out)
    log(f"{name} cold {time.time()-t0:.1f}s")
    t0 = time.time()
    for _ in range(20):
        out = fn(na, nb, eb)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / 20
    log(f"{name} warm {dt*1000:.1f}ms/call")
    if ref is None:
        ref = np.asarray(out)
    else:
        match = np.array_equal(np.asarray(out), ref)
        log(f"{name} matches bsearch: {match}")
