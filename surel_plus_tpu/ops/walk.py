"""TPU-native walk-based node-set sampling with landing-probability encoding.

Re-implements the semantics of the reference C/OpenMP kernel
`subg_acc.gset_sampler` (subg_acc/subg_acc.c:649-1034) with a design that
maps onto XLA/TPU instead of hashtables and per-seed scalar loops:

  * step-0 "without replacement" (Fisher-Yates partial shuffle in C,
    subg_acc.c:763-776,793-800)  ->  one global per-row shuffle of the CSR
    `indices` array via a single lexicographic device sort; walk m takes the
    m-th shuffled neighbor (`m % deg` reproduces the C round-robin when
    deg <= num_walks, subg_acc.c:795).
  * later steps uniform-with-replacement (`rand_r % deg`, subg_acc.c:804-808)
    ->  vectorized gathers under `lax.scan`, counter-based PRNG
    (`jax.random.fold_in`) so results are independent of thread count —
    unlike the reference, whose output depends on OMP thread id
    (subg_acc.c:731-732).
  * per-seed hashtable dedup + landing counts (subg_acc.c:779-845)  ->
    per-seed sort of the visit list + segment-sum into a padded
    [block, bucket, num_steps+1] tile.
  * walks stuck at degree-0 nodes stay in place, reproducing the C
    "no neighbors -> stay" rule (subg_acc.c:804-808) and the degree-0 root
    convention (count = num_walks at every step, subg_acc.c:753-761).

All shapes are static; seeds are processed in fixed-size blocks (the C
NMAX=65536 blocking, subg_acc.c:736) so the kernel jit-compiles once.
"""

from __future__ import annotations

import functools
import os
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

INT32_MAX = np.iinfo(np.int32).max

# fuse the per-step (start, degree) indptr lookups into ONE [N, 2]
# row gather (rows vectorize across lanes; separate per-element gathers
# run ~1 element/cycle). SUREL_WALK_FUSION=0 restores the 2-gather
# baseline for A/B measurement.
_FUSE_START_DEG = os.environ.get("SUREL_WALK_FUSION", "1") != "0"

# edge-table walk: precompute [E, 3] (neighbor, neighbor_start,
# neighbor_deg) rows so every walk step is ONE row gather — the scan
# carries (cur, start, deg) and never touches indptr/indices again.
# Bit-exact with the baseline (identical PRNG picks). SUREL_WALK_EDGE_TABLE=0
# restores the two-gather-per-step path for A/B measurement.
# Measured (TPU v5e, scripts/probe_walk_table.py, 250k nodes E=2.5M
# M=100 S'=3): 140k -> 359k sets/s (x2.56).
_EDGE_TABLE = os.environ.get("SUREL_WALK_EDGE_TABLE", "1") != "0"


@jax.jit
def build_walk_tables(indptr: jax.Array, indices: jax.Array,
                      shuffled_indices: jax.Array):
    """Build the edge-table pair for the one-gather-per-step walk.

    etab[j] = (indices[j],  start[indices[j]],  deg[indices[j]])
    stab[j] = (shuffled[j], start[shuffled[j]], deg[shuffled[j]])

    Two [E]-row gathers, once per (graph, shuffle) — amortized over every
    seed block; each walk step then needs a single [B, M, 3] row gather
    instead of a [B, M, 2] row gather plus a per-element indices gather.
    """
    start_deg = jnp.stack([indptr[:-1], indptr[1:] - indptr[:-1]], axis=-1)
    etab = jnp.concatenate([indices[:, None], start_deg[indices]], axis=1)
    stab = jnp.concatenate(
        [shuffled_indices[:, None], start_deg[shuffled_indices]], axis=1)
    return etab, stab


def enc_field_layout(num_walks: int, num_steps: int):
    """Bit layout for the packed landing-count key.

    The C reference packs columns 1..S contiguously with SHIFT bits each
    plus a LEAD root bit (subg_acc.c:900-955). We keep SHIFT and the
    semantic content but pad field starts so no field straddles the 32-bit
    word boundary: the key then lives in a (hi, lo) uint32 pair AND a
    segment's key equals the *modular uint32 sum* of its per-visit field
    contributions — which turns landing-count accumulation into a cumsum +
    boundary-difference (scatter-free, carry-free).

    Returns (shift, starts, lead_bit) with starts[j] = bit of column j
    (column S at the bottom, column 1 highest — same significance order as
    the C layout).
    """
    shift = int(num_walks).bit_length()
    starts = {}
    bit = 0
    for j in range(num_steps, 0, -1):
        if bit < 32 < bit + shift:
            bit = 32  # pad past the word boundary
        starts[j] = bit
        bit += shift
    if bit < 32 < bit + 1:
        bit = 32
    lead_bit = bit
    total = lead_bit + 1
    if total > 62:  # reserve top bits for the dedup sentinel
        raise ValueError(
            f"encoding key needs {total} bits > 62 "
            f"(num_walks={num_walks}, num_steps={num_steps}); the C "
            f"reference has the same 64-bit limit (subg_acc.c:905-914)")
    return shift, starts, lead_bit


def shuffle_csr_rows(row_ids: jax.Array, indices: jax.Array,
                     key: jax.Array) -> jax.Array:
    """Randomly permute CSR `indices` within each row.

    One global lexicographic sort by (row_id, random_key) — the TPU-native
    replacement for per-seed Fisher-Yates partial shuffles: afterwards,
    `out[indptr[u] + j]` is the j-th element of a uniform random permutation
    of u's neighborhood. `row_ids` is the per-edge row id (host-computed
    np.repeat(arange(N), degrees) — cheaper than a device searchsorted).
    """
    rand = jax.random.bits(key, indices.shape, dtype=jnp.uint32)
    _, _, shuffled = jax.lax.sort((row_ids, rand, indices), num_keys=2)
    return shuffled


def rows_searchsorted(a: jax.Array, t: jax.Array) -> jax.Array:
    """Batched lower-bound binary search: first index where a[b, i] >= t[b, j].

    a: [B, N] sorted rows; t: [B, T] targets -> int32 [B, T].

    Explicit fixed-depth search built from gathers (`take_along_axis`) —
    scatter-free and fully lane-vectorized on TPU, unlike generic
    scatter-based segment ops.
    """
    B, N = a.shape
    depth = max(int(np.ceil(np.log2(N + 1))), 1)
    lo = jnp.zeros(t.shape, jnp.int32)
    hi = jnp.full(t.shape, N, jnp.int32)
    for _ in range(depth):
        mid = (lo + hi) >> 1
        amid = jnp.take_along_axis(a, jnp.minimum(mid, N - 1), axis=1)
        active = lo < hi
        go_right = (amid < t) & active
        new_lo = jnp.where(go_right, mid + 1, lo)
        new_hi = jnp.where(active & ~go_right, mid, hi)
        lo, hi = new_lo, new_hi
    return lo


def _walk_block_tables(indptr: jax.Array, etab: jax.Array, stab: jax.Array,
                       seeds: jax.Array, num_walks: int, num_steps: int,
                       key: jax.Array, replacement: bool = False
                       ) -> jax.Array:
    """Edge-table walk: one [B, M, 3] row gather per step (see
    `build_walk_tables`). Emits node ids identical to `_walk_block` — the
    PRNG draws and modular picks are computed with the same expressions in
    the same order, so outputs are bit-exact with the gather baseline."""
    block = seeds.shape[0]
    sd = jnp.stack([indptr[:-1], indptr[1:] - indptr[:-1]], axis=-1)[seeds]
    start, deg = sd[..., 0], sd[..., 1]

    if replacement:
        r0 = jax.random.bits(jax.random.fold_in(key, 0x5eed),
                             (block, num_walks), dtype=jnp.uint32)
        offs = (r0 % jnp.maximum(deg[:, None], 1).astype(jnp.uint32)
                ).astype(jnp.int32)
        row0 = etab[start[:, None] + offs]
    else:
        m = jnp.arange(num_walks, dtype=jnp.int32)
        offs = m[None, :] % jnp.maximum(deg[:, None], 1)
        row0 = stab[start[:, None] + offs]
    live0 = deg[:, None] > 0
    w0 = jnp.where(live0, row0[..., 0], seeds[:, None])
    if num_steps == 1:
        return w0[:, :, None]

    # stuck walkers (deg-0 seed) carry d=0 and stay in place forever; their
    # st value is an arbitrary in-range edge slot (pick is always 0)
    st = row0[..., 1]
    d = jnp.where(live0, row0[..., 2], 0)

    def step(carry, step_key):
        cur, st, d = carry
        r = jax.random.bits(step_key, cur.shape, dtype=jnp.uint32)
        pick = (r % jnp.maximum(d, 1).astype(jnp.uint32)).astype(jnp.int32)
        rowt = etab[st + pick]
        live = d > 0
        nxt = jnp.where(live, rowt[..., 0], cur)
        st2 = jnp.where(live, rowt[..., 1], st)
        d2 = jnp.where(live, rowt[..., 2], d)
        return (nxt, st2, d2), nxt

    step_keys = jax.random.split(key, num_steps - 1)
    _, rest = jax.lax.scan(step, (w0, st, d), step_keys)
    walks = jnp.concatenate([w0[:, :, None],
                             jnp.moveaxis(rest, 0, -1)], axis=-1)
    return walks


def _walk_block(indptr: jax.Array, indices: jax.Array,
                shuffled_indices: jax.Array, seeds: jax.Array,
                num_walks: int, num_steps: int, key: jax.Array,
                replacement: bool = False) -> jax.Array:
    """Run `num_walks` walks of `num_steps` steps from each seed.

    Returns int32 [block, num_walks, num_steps] node ids (the node visited at
    each step; step 0 = first hop). `replacement=True` makes step 0 uniform
    i.i.d. like later steps (the SUREL-v1 `random_walk` mode,
    subg_acc.c:144-180); default is the SUREL+ without-replacement first hop.
    """
    block = seeds.shape[0]
    if _FUSE_START_DEG:
        # [N, 2] (start, degree) table built on device per call (one
        # vector pass over indptr — noise next to the walk gathers)
        start_deg = jnp.stack(
            [indptr[:-1], indptr[1:] - indptr[:-1]], axis=-1)
        sd = start_deg[seeds]
        start, deg = sd[..., 0], sd[..., 1]
    else:
        start_deg = None
        start = indptr[seeds]
        deg = indptr[seeds + 1] - start

    if replacement:
        r0 = jax.random.bits(jax.random.fold_in(key, 0x5eed), (block, num_walks),
                             dtype=jnp.uint32)
        offs = (r0 % jnp.maximum(deg[:, None], 1).astype(jnp.uint32)
                ).astype(jnp.int32)
        w0 = indices[start[:, None] + offs]
    else:
        # Step 0: without replacement via the per-row shuffle. `m % deg`
        # gives round-robin coverage when deg <= num_walks and the first
        # num_walks entries of a random permutation otherwise — exactly the
        # C semantics (subg_acc.c:793-800) up to permutation randomness.
        m = jnp.arange(num_walks, dtype=jnp.int32)
        offs = m[None, :] % jnp.maximum(deg[:, None], 1)
        w0 = shuffled_indices[start[:, None] + offs]
    w0 = jnp.where(deg[:, None] > 0, w0, seeds[:, None])

    if num_steps == 1:
        return w0[:, :, None]

    def step(cur, step_key):
        if _FUSE_START_DEG:
            sdc = start_deg[cur]              # one [B, M, 2] row gather
            st, d = sdc[..., 0], sdc[..., 1]
        else:
            st = indptr[cur]
            d = indptr[cur + 1] - st
        r = jax.random.bits(step_key, cur.shape, dtype=jnp.uint32)
        pick = (r % jnp.maximum(d, 1).astype(jnp.uint32)).astype(jnp.int32)
        nxt = indices[st + pick]
        nxt = jnp.where(d > 0, nxt, cur)
        return nxt, nxt

    step_keys = jax.random.split(key, num_steps - 1)
    _, rest = jax.lax.scan(step, w0, step_keys)
    # rest: [num_steps-1, block, num_walks] -> [block, num_walks, num_steps-1]
    walks = jnp.concatenate([w0[:, :, None],
                             jnp.moveaxis(rest, 0, -1)], axis=-1)
    return walks


def _build_sets_block(seeds: jax.Array, walks: jax.Array, num_walks: int,
                      num_steps: int, bucket: int
                      ) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Dedup walk visits per seed and accumulate landing counts per step.

    Returns:
      nodes:  int32 [block, bucket] unique visited nodes per seed, ascending,
              padded with INT32_MAX.
      counts: int32 [block, bucket, num_steps+1] landing counts; column 0 is
              num_walks for the root row and 0 elsewhere (subg_acc.c:751).
      sizes:  int32 [block] set sizes (always >= 1: the root).
    """
    block = seeds.shape[0]
    ncol = num_steps + 1
    visits = 1 + num_walks * num_steps

    # visit list: the root (column 0) then every walk step (column step+1) —
    # matching buffer[idx, step+1]++ at subg_acc.c:830; the root's
    # num_walks weight (subg_acc.c:751) is added after counting.
    nodes = jnp.concatenate(
        [seeds[:, None], walks.reshape(block, num_walks * num_steps)], axis=1)
    cols = jnp.concatenate([
        jnp.zeros((1,), jnp.int32),
        jnp.broadcast_to(jnp.arange(1, ncol, dtype=jnp.int32)[None, :],
                         (num_walks, num_steps)).reshape(-1),
    ])
    cols_b = jnp.broadcast_to(cols[None, :], (block, visits))

    # Sort visits by (node, col): afterwards the dense key
    # compact_slot * ncol + col is monotone per row, so every aggregation
    # below is a batched binary search — no scatters, which XLA lowers to
    # serialized loops on TPU.
    snodes, scols = jax.lax.sort((nodes, cols_b), dimension=1, num_keys=2)

    first = jnp.concatenate([
        jnp.ones((block, 1), dtype=bool),
        snodes[:, 1:] != snodes[:, :-1],
    ], axis=1)
    compact = jnp.cumsum(first, axis=1).astype(jnp.int32) - 1
    sizes = jnp.minimum(compact[:, -1] + 1, bucket)

    # Unique nodes: first visit position of slot s is lower_bound(compact, s).
    slots = jnp.arange(bucket, dtype=jnp.int32)
    pos = rows_searchsorted(compact, jnp.broadcast_to(
        slots[None, :], (block, bucket)))
    nodes_out = jnp.take_along_axis(snodes, jnp.minimum(pos, visits - 1),
                                    axis=1)
    valid = slots[None, :] < sizes[:, None]
    nodes_out = jnp.where(valid, nodes_out, INT32_MAX)

    # Landing counts: count of dense key d == lower_bound(d+1) -
    # lower_bound(d); overflow visits (compact >= bucket) fall outside the
    # target range and are dropped — the C kernel also drops overflow,
    # keeping the first-discovered `bucket` nodes (subg_acc.c:826-836); we
    # keep the `bucket` smallest node ids instead (sorted layout) —
    # identical whenever bucket >= unique count, which holds for the
    # default bucket = num_walks*num_steps+1.
    dkey = compact * ncol + scols
    targets = jnp.arange(bucket * ncol + 1, dtype=jnp.int32)
    bounds = rows_searchsorted(dkey, jnp.broadcast_to(
        targets[None, :], (block, bucket * ncol + 1)))
    counts = (bounds[:, 1:] - bounds[:, :-1]).reshape(block, bucket, ncol)

    # Root landing weight: the root visit was counted once at column 0;
    # the C kernel stores num_walks there (subg_acc.c:751).
    root_slot = rows_searchsorted(nodes_out, seeds[:, None])[:, 0]
    root_onehot = (slots[None, :] == root_slot[:, None]).astype(jnp.int32)
    col_onehot = (jnp.arange(ncol, dtype=jnp.int32) == 0).astype(jnp.int32)
    counts = counts + (num_walks - 1) * (root_onehot[:, :, None]
                                         * col_onehot[None, None, :])
    return nodes_out, counts, sizes


def _pack_block(counts: jax.Array, nodes: jax.Array, seeds: jax.Array,
                num_walks: int, num_steps: int
                ) -> Tuple[jax.Array, jax.Array]:
    """Bit-pack each landing-count row into a (hi, lo) uint32 pair using
    `enc_field_layout` (the C bit-hash semantics, subg_acc.c:900-955:
    columns 1..S as fields plus a LEAD root bit; column 0 is determined by
    LEAD, being num_walks for roots and 0 otherwise)."""
    shift, starts, lead_bit = enc_field_layout(num_walks, num_steps)
    lo = jnp.zeros(counts.shape[:2], jnp.uint32)
    hi = jnp.zeros(counts.shape[:2], jnp.uint32)
    for j in range(1, num_steps + 1):
        v = counts[:, :, j].astype(jnp.uint32)
        if starts[j] < 32:
            lo = lo | (v << starts[j])
        else:
            hi = hi | (v << (starts[j] - 32))
    is_root = (nodes == seeds[:, None]).astype(jnp.uint32)
    if lead_bit < 32:
        lo = lo | (is_root << lead_bit)
    else:
        hi = hi | (is_root << (lead_bit - 32))
    return hi, lo


def unpack_encodings(packed: np.ndarray, num_walks: int,
                     num_steps: int) -> np.ndarray:
    """Invert the bit-pack: uint64 keys -> int32 [n, num_steps+1] counts."""
    shift, starts, lead_bit = enc_field_layout(num_walks, num_steps)
    mask = np.uint64((1 << shift) - 1)
    ncol = num_steps + 1
    out = np.zeros((len(packed), ncol), dtype=np.int32)
    root = (packed >> np.uint64(lead_bit)) & np.uint64(1)
    out[:, 0] = root.astype(np.int32) * num_walks
    for j in range(1, ncol):
        out[:, j] = ((packed >> np.uint64(starts[j])) & mask).astype(
            np.int32)
    return out


def _build_sets_packed_block(seeds: jax.Array, walks: jax.Array,
                             num_walks: int, num_steps: int, bucket: int,
                             num_nodes: int | None = None
                             ) -> Tuple[jax.Array, jax.Array, jax.Array,
                                        jax.Array]:
    """Fused set building + key packing, gather-light.

    Skips the dense [bucket, ncol] counts tensor entirely: per-visit field
    contributions (1 << start_bit[col]) are prefix-summed along the sorted
    visit list (uint32 modular — exact per segment because fields never
    straddle the word boundary and never overflow their width), and each
    set slot's packed key is the boundary difference. Cost per block: one
    two-key sort, one slot binary search, two cumsums, O(1) gathers —
    versus the dense-target search's ~bucket*ncol*log(V) gathers.

    Two static specializations (sort cost scales with operand count):
      * when `num_nodes` is given and (node, vpos) fits 31 bits, the visit
        sort runs on ONE packed int32 operand instead of key+payload;
      * when the field layout fits the lo word (lead_bit < 32 — true for
        every published config, e.g. M=100 S'=3 -> 22 bits), the hi-word
        cumsum/sort-payload/boundary plumbing is dropped entirely.

    Returns (nodes [B, bucket], sizes [B], hi [B, bucket], lo [B, bucket]).
    """
    block = seeds.shape[0]
    visits = 1 + num_walks * num_steps
    shift, starts, lead_bit = enc_field_layout(num_walks, num_steps)
    use_hi = lead_bit >= 32

    nodes = jnp.concatenate(
        [seeds[:, None], walks.reshape(block, num_walks * num_steps)],
        axis=1)
    # sort visits by node id carrying only the visit position; the walk
    # column (and its packed field contribution) is derived from the
    # position arithmetically — one payload operand instead of three
    vbits = max((visits - 1).bit_length(), 1)
    if num_nodes is not None and num_nodes <= (1 << (31 - vbits)):
        # (node, vpos) packed into one int32: the stable key-sort by node
        # with ascending-iota payload orders ties by vpos, so sorting the
        # packed key is order-identical — and needs no payload operand.
        vpos0 = jnp.arange(visits, dtype=jnp.int32)
        packed = (nodes << vbits) | vpos0[None, :]
        spacked = jax.lax.sort(packed, dimension=1)
        snodes = spacked >> vbits
        svpos = spacked & ((1 << vbits) - 1)
    else:
        vpos0 = jnp.broadcast_to(
            jnp.arange(visits, dtype=jnp.int32)[None, :], (block, visits))
        snodes, svpos = jax.lax.sort((nodes, vpos0), dimension=1,
                                     num_keys=1)

    # visit layout: position 0 is the root (col 0); positions 1.. are the
    # flattened [num_walks, num_steps] walk matrix -> col = (p-1) % S + 1
    scols = jnp.where(svpos == 0, 0,
                      (svpos - 1) % num_steps + 1).astype(jnp.int32)
    s_lo = jnp.zeros((block, visits), jnp.uint32)
    s_hi = jnp.zeros((block, visits), jnp.uint32) if use_hi else None
    for j in range(1, num_steps + 1):
        sel = scols == j
        if starts[j] < 32:
            s_lo = jnp.where(sel, s_lo | jnp.uint32(1 << starts[j]), s_lo)
        else:
            s_hi = jnp.where(
                sel, s_hi | jnp.uint32(1 << (starts[j] - 32)), s_hi)

    first = jnp.concatenate([
        jnp.ones((block, 1), dtype=bool),
        snodes[:, 1:] != snodes[:, :-1],
    ], axis=1)
    n_uniq = jnp.sum(first, axis=1).astype(jnp.int32)
    sizes = jnp.minimum(n_uniq, bucket)

    # Exclusive prefix sums of the field contributions (uint32 modular —
    # exact per segment, see above): the sum over slot s's segment equals
    # P[start(s+1)] - P[start(s)].
    pre_lo = jnp.cumsum(s_lo, axis=1, dtype=jnp.uint32)
    excl_lo = pre_lo - s_lo
    if use_hi:
        pre_hi = jnp.cumsum(s_hi, axis=1, dtype=jnp.uint32)
        excl_hi = pre_hi - s_hi

    # One compaction sort moves segment-start entries to the front in node
    # order, carrying each start's exclusive prefix: adjacent differences
    # of the carried prefixes ARE the per-slot packed keys — no
    # boundary-position gathers at all (take_along_axis runs near one
    # element per cycle on TPU).
    key2 = jnp.where(first, snodes, INT32_MAX)
    if use_hi:
        k2, p_lo, p_hi = jax.lax.sort((key2, excl_lo, excl_hi), num_keys=1)
    else:
        k2, p_lo = jax.lax.sort((key2, excl_lo), num_keys=1)
    if visits < bucket:
        padw = bucket - visits
        k2 = jnp.concatenate(
            [k2, jnp.full((block, padw), INT32_MAX, jnp.int32)], axis=1)
        p_lo = jnp.concatenate(
            [p_lo, jnp.zeros((block, padw), jnp.uint32)], axis=1)
        if use_hi:
            p_hi = jnp.concatenate(
                [p_hi, jnp.zeros((block, padw), jnp.uint32)], axis=1)
    # next-start prefixes taken BEFORE truncation: when n_uniq > bucket the
    # last kept slot's segment must end at the first dropped segment's
    # start (overflow counts are dropped, matching the C kernel's behavior
    # subg_acc.c:826-836), not at the visit total.
    if p_lo.shape[1] > bucket:
        next_lo = p_lo[:, 1:bucket + 1]
        next_hi = p_hi[:, 1:bucket + 1] if use_hi else None
    else:
        next_lo = jnp.concatenate([p_lo[:, 1:], pre_lo[:, -1:]], axis=1)
        next_hi = jnp.concatenate(
            [p_hi[:, 1:], pre_hi[:, -1:]], axis=1) if use_hi else None
    nodes_out = k2[:, :bucket]
    p_lo = p_lo[:, :bucket]

    slots = jnp.arange(bucket, dtype=jnp.int32)
    valid = slots[None, :] < sizes[:, None]
    nodes_out = jnp.where(valid, nodes_out, INT32_MAX)

    # the last real slot of an UNtruncated row ends at the visit total
    # (its successor entry in the compaction sort is sentinel garbage)
    is_last_untrunc = (slots[None, :] == sizes[:, None] - 1) \
        & (n_uniq <= bucket)[:, None]
    next_lo = jnp.where(is_last_untrunc, pre_lo[:, -1:], next_lo)
    lo_keys = jnp.where(valid, next_lo - p_lo, 0)

    is_root = (nodes_out == seeds[:, None]).astype(jnp.uint32)
    if use_hi:
        p_hi = p_hi[:, :bucket]
        next_hi = jnp.where(is_last_untrunc, pre_hi[:, -1:], next_hi)
        hi_keys = jnp.where(valid, next_hi - p_hi, 0)
        if lead_bit >= 32:
            hi_keys = hi_keys | (is_root << (lead_bit - 32))
        hi_keys = jnp.where(valid, hi_keys, 0)
    else:
        hi_keys = jnp.zeros((block, bucket), jnp.uint32)
    if lead_bit < 32:
        lo_keys = lo_keys | (is_root << lead_bit)
    lo_keys = jnp.where(valid, lo_keys, 0)
    return nodes_out, sizes, hi_keys, lo_keys


@functools.partial(
    jax.jit,
    static_argnames=("num_walks", "num_steps", "bucket", "replacement"))
def sample_block(indptr: jax.Array, indices: jax.Array,
                 shuffled_indices: jax.Array, seeds: jax.Array,
                 key: jax.Array, *, num_walks: int, num_steps: int,
                 bucket: int, replacement: bool = False,
                 etab: jax.Array | None = None,
                 stab: jax.Array | None = None):
    """Jitted per-block pipeline: walks -> sets -> counts -> packed keys.

    Pass `etab`/`stab` (from `build_walk_tables`) to use the
    one-row-gather-per-step walk; outputs are bit-exact either way.

    Returns (nodes [B, bucket], sizes [B], hi [B, bucket], lo [B, bucket]).
    """
    if etab is not None:
        walks = _walk_block_tables(indptr, etab, stab, seeds, num_walks,
                                   num_steps, key, replacement=replacement)
    else:
        walks = _walk_block(indptr, indices, shuffled_indices, seeds,
                            num_walks, num_steps, key,
                            replacement=replacement)
    return _build_sets_packed_block(seeds, walks, num_walks, num_steps,
                                    bucket,
                                    num_nodes=indptr.shape[0] - 1)


@functools.partial(
    jax.jit,
    static_argnames=("num_walks", "num_steps", "bucket", "replacement"))
def walk_block_with_rpe(indptr: jax.Array, indices: jax.Array,
                        shuffled_indices: jax.Array, seeds: jax.Array,
                        key: jax.Array, *, num_walks: int, num_steps: int,
                        bucket: int, replacement: bool = True):
    """SUREL-v1 surface: raw walks plus per-seed relative positional
    encodings (the C `walk_sampler`+`rpe_encoder` pair, subg_acc.c:316-389,
    249-314). Returns (walks [B, M, S'+1] including the root at position 0,
    nodes [B, bucket], counts [B, bucket, S'+1], sizes [B])."""
    steps = _walk_block(indptr, indices, shuffled_indices, seeds,
                        num_walks, num_steps, key, replacement=replacement)
    root = jnp.broadcast_to(seeds[:, None, None],
                            (*steps.shape[:2], 1))
    walks = jnp.concatenate([root, steps], axis=-1)
    nodes, counts, sizes = _build_sets_block(
        seeds, steps, num_walks, num_steps, bucket)
    return walks, nodes, counts, sizes
