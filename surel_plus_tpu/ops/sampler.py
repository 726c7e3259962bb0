"""Host driver for set sampling: block pipeline + global encoding dedup.

Equivalent of `subg_matrix` (reference sampler/random_walks.py:74-82) plus
the compression stage of `gset_sampler` (subg_acc.c:900-1009): runs the
jitted per-block device kernel over fixed-size seed blocks, then dedups the
bit-packed structural encodings globally and assembles an `SpG`.

Conventions follow the reference CLI: `num_steps=S` means walks of S-1 steps
and an encoding of S columns (random_walks.py:77-78 passes num_steps-1).
"""

from __future__ import annotations

import functools
import logging
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from surel_plus_tpu.graph.csr import CSRGraph
from surel_plus_tpu.ops import walk as walk_ops
from surel_plus_tpu.spg.spg import SpG

log = logging.getLogger(__name__)

DEFAULT_BLOCK = 65536  # C NMAX blocking, subg_acc.c:12

def device_graph(graph: CSRGraph):
    """Upload a CSR graph (indptr, indices) to HBM once per graph object —
    host->device uploads are expensive and the arrays are immutable.
    Cached on the object itself (id()-keyed dicts collide after GC)."""
    cache = getattr(graph, "_device_cache", None)
    if cache is None:
        cache = {}
        object.__setattr__(graph, "_device_cache", cache)
    if "csr" not in cache:
        cache["csr"] = graph.device()
    return cache["csr"]


def shuffled_indices_for(graph: CSRGraph, seed: int):
    """Per-row random permutation of CSR indices, computed host-side
    (np.lexsort over (row, rand) — one pass, no device compile) and
    uploaded once per (graph, seed)."""
    cache = getattr(graph, "_device_cache", None)
    if cache is None:
        cache = {}
        object.__setattr__(graph, "_device_cache", cache)
    key = ("shuffle", seed)
    if key not in cache:
        from surel_plus_tpu.graph.native import shuffle_rows_native

        shuffled = shuffle_rows_native(graph, seed)  # C++/OpenMP O(E)
        if shuffled is None:  # toolchain-less fallback
            rng = np.random.default_rng(seed)
            row_ids = np.repeat(np.arange(graph.num_nodes, dtype=np.int64),
                                graph.degrees().astype(np.int64))
            order = np.lexsort((rng.random(graph.num_edges), row_ids))
            shuffled = graph.indices[order]
        cache[key] = jnp.asarray(shuffled)
    return cache[key]


def walk_tables_for(graph: CSRGraph, seed: int):
    """Edge-table pair for the one-gather-per-step walk
    (`walk_ops.build_walk_tables`), cached per (graph, shuffle seed).
    Returns (None, None) when the edge-table path is disabled."""
    if not walk_ops._EDGE_TABLE:
        return None, None
    cache = getattr(graph, "_device_cache", None)
    if cache is None:
        cache = {}
        object.__setattr__(graph, "_device_cache", cache)
    key = ("walk_tables", seed)
    if key not in cache:
        indptr, indices = device_graph(graph)
        shuffled = shuffled_indices_for(graph, seed)
        etab, stab = walk_ops.build_walk_tables(indptr, indices, shuffled)
        cache[key] = (etab, stab)
    return cache[key]


def sample_gsets(
    graph: CSRGraph,
    seeds: np.ndarray,
    num_walks: int,
    num_steps: int,
    seed: int = 111413,
    bucket: Optional[int] = None,
    block_size: int = DEFAULT_BLOCK,
    shuffle_seed: Optional[int] = None,
) -> SpG:
    """Sample node sets + LP encodings for `seeds`. `num_steps` is the walk
    step count S' (C convention); the encoding has S'+1 columns.

    Returns an SpG with globally deduped encodings (sorted-key order; the C
    reference numbers encodings in first-occurrence order, which is an
    equivalent relabeling — subg_acc.c:957-978).
    """
    seeds = np.asarray(seeds, dtype=np.int32)
    n = len(seeds)
    if bucket is None:
        bucket = num_walks * num_steps + 1
    walk_ops.enc_field_layout(num_walks, num_steps)  # validate bit budget

    t0 = time.time()
    indptr, indices = device_graph(graph)
    root = jax.random.PRNGKey(seed)
    sseed = seed if shuffle_seed is None else shuffle_seed
    shuffled = shuffled_indices_for(graph, sseed)
    etab, stab = walk_tables_for(graph, sseed)

    nblocks = (n + block_size - 1) // block_size
    nodes_h = np.empty((n, bucket), dtype=np.int32)
    sizes_h = np.empty((n,), dtype=np.int32)
    packed_h = np.empty((n, bucket), dtype=np.uint64)

    for b in range(nblocks):
        lo_i, hi_i = b * block_size, min((b + 1) * block_size, n)
        blk = seeds[lo_i:hi_i]
        if len(blk) < block_size:  # pad to static shape; extra rows discarded
            blk = np.concatenate(
                [blk, np.zeros(block_size - len(blk), np.int32)])
        nodes, sizes, hi, lo = walk_ops.sample_block(
            indptr, indices, shuffled, jnp.asarray(blk),
            jax.random.fold_in(root, b + 1),
            num_walks=num_walks, num_steps=num_steps, bucket=bucket,
            etab=etab, stab=stab)
        m = hi_i - lo_i
        nodes_h[lo_i:hi_i] = np.asarray(nodes)[:m]
        sizes_h[lo_i:hi_i] = np.asarray(sizes)[:m]
        packed_h[lo_i:hi_i] = (
            (np.asarray(hi)[:m].astype(np.uint64) << np.uint64(32))
            | np.asarray(lo)[:m].astype(np.uint64))
    dt_w = time.time() - t0

    # ---- Global encoding dedup (C bit-hash + hashtable, subg_acc.c:957-978;
    # here: flatten valid rows -> np.unique -> searchsorted remap). ----
    t1 = time.time()
    valid = np.arange(bucket, dtype=np.int32)[None, :] < sizes_h[:, None]
    flat = packed_h[valid]
    uniq = np.unique(flat)
    eidx_flat = np.searchsorted(uniq, flat).astype(np.int32) + 1
    eidx = np.zeros((n, bucket), dtype=np.int32)
    eidx[valid] = eidx_flat
    enc = np.concatenate([
        np.zeros((1, num_steps + 1), dtype=np.int32),
        walk_ops.unpack_encodings(uniq, num_walks, num_steps),
    ])
    dt_e = time.time() - t1

    ntotal = int(sizes_h.sum())
    log.info(
        "sample_gsets: #total %d; #max_set %d of %d; buffer usage %.2f%%; "
        "dT_w %.2fs | #enc_unique %d; compression %.2f; dT_e %.2fs",
        ntotal, int(sizes_h.max()) if n else 0, bucket,
        100.0 * ntotal / max(n * bucket, 1), dt_w,
        len(uniq), ntotal / max(len(uniq), 1), dt_e)

    return SpG(nodes=nodes_h, eidx=eidx, sizes=sizes_h, enc=enc,
               seeds=seeds, num_walks=num_walks, num_steps=num_steps)


UINT32_SENTINEL = np.uint32(0xFFFFFFFF)


def _pad_axis1(x, width, fill):
    if x.shape[1] == width:
        return x
    return jnp.concatenate(
        [x, jnp.full((x.shape[0], width - x.shape[1]), fill, x.dtype)],
        axis=1)


def _dedup_sorted_rows(h, l):
    """Row-sort (hi, lo) pairs, sentinel out duplicates, re-sort to
    compact uniques to the row front. All ops vectorize across rows."""
    h, l = jax.lax.sort((h, l), dimension=1, num_keys=2)
    dup = (h[:, 1:] == h[:, :-1]) & (l[:, 1:] == l[:, :-1])
    first = jnp.concatenate(
        [jnp.ones((h.shape[0], 1), bool), ~dup], axis=1)
    h = jnp.where(first, h, UINT32_SENTINEL)
    l = jnp.where(first, l, UINT32_SENTINEL)
    return jax.lax.sort((h, l), dimension=1, num_keys=2)


def _table_searchsorted_pair(th, tl, kh, kl):
    """Lower-bound binary search of (kh, kl) pairs in the shared sorted
    table (th, tl) — flat gathers, no scatters."""
    W = th.shape[0]
    depth = max(int(np.ceil(np.log2(W + 1))), 1)
    lo = jnp.zeros(kh.shape, jnp.int32)
    hi_b = jnp.full(kh.shape, W, jnp.int32)
    for _ in range(depth):
        mid = (lo + hi_b) >> 1
        safe = jnp.minimum(mid, W - 1)
        mh = jnp.take(th, safe)
        ml = jnp.take(tl, safe)
        less = (mh < kh) | ((mh == kh) & (ml < kl))
        active = lo < hi_b
        go = less & active
        lo = jnp.where(go, mid + 1, lo)
        hi_b = jnp.where(active & ~go, mid, hi_b)
    return lo


@functools.partial(jax.jit, static_argnames=("bucket", "width"))
def _dedup_device_tree(nodes, sizes, hi, lo, *, bucket, width):
    """Global encoding dedup via a 2-D merge tree — every sort is a row
    sort (vectorized compare-exchange across rows), since XLA lowers 1-D
    sorts on TPU to effectively serial sorting networks.

    Exploits SUREL+'s core observation that unique structural encodings are
    few (paper §3.2's compression): the merge tree truncates each merged
    row to `width` unique keys and reports overflow if the global unique
    count ever exceeds it (caller retries wider or falls back).

    Returns (eidx [n, bucket], table_hi [width], table_lo [width],
    num_unique, overflow).
    """
    n = hi.shape[0]
    slot = jnp.arange(bucket, dtype=jnp.int32)[None, :]
    valid = slot < sizes[:, None]
    h = jnp.where(valid, hi, UINT32_SENTINEL)
    l = jnp.where(valid, lo, UINT32_SENTINEL)

    h, l = _dedup_sorted_rows(h, l)
    overflow = jnp.zeros((), bool)
    rows, w = n, bucket
    while rows > 1:
        # 8-way merges keep the unrolled tree shallow while rows are
        # narrow; once merged rows get wide the sort's row-parallelism is
        # gone (few rows x huge width), so drop to pairwise merges — a
        # sort of [r/2, 2w] costs ~4x less than [r/8, 8w] per level in
        # the serial tail and keeps 4x more rows for lane parallelism.
        FAN = 8 if 8 * w <= 32768 else 2
        fan = min(FAN, rows)
        if rows % fan:
            pad_rows = fan - rows % fan
            h = jnp.concatenate(
                [h, jnp.full((pad_rows, w), UINT32_SENTINEL, h.dtype)])
            l = jnp.concatenate(
                [l, jnp.full((pad_rows, w), UINT32_SENTINEL, l.dtype)])
            rows += pad_rows
        h = h.reshape(rows // fan, fan * w)
        l = l.reshape(rows // fan, fan * w)
        h, l = _dedup_sorted_rows(h, l)
        # keep rows at most `width` wide: memory stays ~n*bucket while the
        # kept width grows toward the target as rows shrink
        w_next = min(fan * w, width)
        if w_next < fan * w:
            overflow = overflow | jnp.any(h[:, w_next] != UINT32_SENTINEL)
            h = h[:, :w_next]
            l = l[:, :w_next]
        rows //= fan
        w = w_next

    h = _pad_axis1(h, width, UINT32_SENTINEL)
    l = _pad_axis1(l, width, UINT32_SENTINEL)
    table_hi, table_lo = h[0], l[0]
    num_unique = (table_hi != UINT32_SENTINEL).sum().astype(jnp.int32)

    pos = _table_searchsorted_pair(table_hi, table_lo, hi, lo)
    eidx = jnp.where(valid, pos + 1, 0)
    return eidx, table_hi, table_lo, num_unique, overflow


@functools.partial(jax.jit,
                   static_argnames=("num_walks", "num_steps", "cap"))
def _unpack_enc_device(uniq_hi, uniq_lo, *, num_walks, num_steps, cap):
    """Unpack the first `cap` unique keys into a normalized encoding table
    [cap+1, num_steps+1] float32 with the zero row prepended
    (random_walks.py:81, main.py:174's /num_walks normalization)."""
    shift, starts, lead_bit = walk_ops.enc_field_layout(num_walks,
                                                        num_steps)
    ncol = num_steps + 1
    hi = uniq_hi[:cap]
    lo = uniq_lo[:cap]
    mask = jnp.uint32((1 << shift) - 1)

    def field(start_bit):
        # fields never straddle the word boundary (enc_field_layout)
        if start_bit < 32:
            v = (lo >> jnp.uint32(start_bit)) & mask
        else:
            v = (hi >> jnp.uint32(start_bit - 32)) & mask
        return v.astype(jnp.int32)

    cols = [field(starts[j]) for j in range(1, ncol)]
    if lead_bit >= 32:
        root = (hi >> jnp.uint32(lead_bit - 32)) & jnp.uint32(1)
    else:
        root = (lo >> jnp.uint32(lead_bit)) & jnp.uint32(1)
    col0 = (root.astype(jnp.int32) * num_walks)
    counts = jnp.stack([col0] + cols, axis=1)
    # rows past the true unique count are sentinel garbage; they are never
    # referenced (eidx <= U) but zero them for hygiene
    sentinel = (hi == UINT32_SENTINEL) & (lo == UINT32_SENTINEL)
    counts = jnp.where(sentinel[:, None], 0, counts)
    enc = counts.astype(jnp.float32) / num_walks
    return jnp.concatenate([jnp.zeros((1, ncol), jnp.float32), enc])


def sample_gsets_device(
    graph: CSRGraph,
    seeds: np.ndarray,
    num_walks: int,
    num_steps: int,
    seed: int = 111413,
    bucket: Optional[int] = None,
    block_size: int = DEFAULT_BLOCK,
    shuffle_seed: Optional[int] = None,
    enc_width: int = 4096,
    max_enc_width: int = 1 << 16,
):
    """Fully device-resident sampling: SpG tiles and the deduped encoding
    table never leave HBM (host pulls one scalar: the unique count).

    The dedup uses the 2-D merge tree sized `enc_width` (widened x4 on
    overflow up to `max_enc_width`, then falls back to the flat path).
    Returns an `SpGDevice` (enc normalized) plus num_unique. This is the
    production TPU path; `sample_gsets` materializes to host numpy for the
    reference-parity API.
    """
    from surel_plus_tpu.spg.spg import SpGDevice

    seeds = np.asarray(seeds, dtype=np.int32)
    n = len(seeds)
    if bucket is None:
        bucket = num_walks * num_steps + 1
    walk_ops.enc_field_layout(num_walks, num_steps)  # validate bit budget

    t0 = time.time()
    indptr, indices = device_graph(graph)
    root = jax.random.PRNGKey(seed)
    sseed = seed if shuffle_seed is None else shuffle_seed
    shuffled = shuffled_indices_for(graph, sseed)
    etab, stab = walk_tables_for(graph, sseed)

    log.info("sample_gsets_device: graph+shuffle ready %.1fs",
             time.time() - t0)
    nblocks = (n + block_size - 1) // block_size
    nodes_b, sizes_b, hi_b, lo_b = [], [], [], []
    for b in range(nblocks):
        lo_i, hi_i = b * block_size, min((b + 1) * block_size, n)
        blk = seeds[lo_i:hi_i]
        if len(blk) < block_size:
            blk = np.concatenate(
                [blk, np.zeros(block_size - len(blk), np.int32)])
        nodes, sizes, hi, lo = walk_ops.sample_block(
            indptr, indices, shuffled, jnp.asarray(blk),
            jax.random.fold_in(root, b + 1),
            num_walks=num_walks, num_steps=num_steps, bucket=bucket,
            etab=etab, stab=stab)
        log.info("sample_gsets_device: block %d/%d dispatched %.1fs",
                 b + 1, nblocks, time.time() - t0)
        nodes_b.append(nodes)
        sizes_b.append(sizes)
        hi_b.append(hi)
        lo_b.append(lo)
    nodes = jnp.concatenate(nodes_b)[:n] if nblocks > 1 else nodes_b[0][:n]
    sizes = jnp.concatenate(sizes_b)[:n] if nblocks > 1 else sizes_b[0][:n]
    hi = jnp.concatenate(hi_b)[:n] if nblocks > 1 else hi_b[0][:n]
    lo = jnp.concatenate(lo_b)[:n] if nblocks > 1 else lo_b[0][:n]

    # widen x4 on overflow; the merge tree stays row-parallel at any width
    # (pairwise merges past 32k-wide rows), so there is no flat-sort cliff
    # — the hard cap is the visit total itself.
    hard_cap = n * bucket
    width = min(max(enc_width, bucket), hard_cap)
    while True:
        eidx, table_hi, table_lo, num_unique, overflow = _dedup_device_tree(
            nodes, sizes, hi, lo, bucket=bucket, width=width)
        over = bool(overflow)  # scalar sync
        if not over:
            u = int(num_unique)
            break
        if width >= hard_cap:
            raise AssertionError(
                f"dedup overflow at width {width} >= visit total "
                f"{hard_cap} — impossible (every visit is a candidate key)")
        if width >= max_enc_width:
            log.warning(
                "sample_gsets_device: unique encodings exceed %d "
                "(compression ratio < %.1f); widening further", width,
                hard_cap / max(width, 1))
        width = min(width * 4, hard_cap)
        log.info("sample_gsets_device: widening unique table to %d", width)
    log.info("sample_gsets_device: dedup synced %.1fs (u=%d)",
             time.time() - t0, u)
    enc = _unpack_enc_device(table_hi, table_lo, num_walks=num_walks,
                             num_steps=num_steps, cap=width)
    dev = SpGDevice(nodes=nodes, eidx=eidx, sizes=sizes, enc=enc)
    log.info("sample_gsets_device: n=%d bucket=%d enc_unique=%d width=%d "
             "dT=%.2fs", n, bucket, u, width, time.time() - t0)
    return dev, u


def sample_gsets_device_keys(
    graph: CSRGraph,
    seeds: np.ndarray,
    num_walks: int,
    num_steps: int,
    seed: int = 111413,
    bucket: Optional[int] = None,
    block_size: int = DEFAULT_BLOCK,
    shuffle_seed: Optional[int] = None,
):
    """Device-resident sampling WITHOUT the dedup/table stage: the SpG
    stores each set slot's packed landing-count key (hi, lo uint32), and
    joins unpack count features on the fly (ops/join.py:unpack_key_features).

    Rationale: the reference compresses encodings to fit GPU memory and cut
    host->GPU traffic (subg_acc.c:900-1009); on TPU the unpack is five
    shift-and-mask ops fused into the join, so the compressed table buys
    nothing on the hot path — global dedup remains available
    (sample_gsets_device) for the table embed mode and for compression
    statistics.

    Returns SpGKeys(nodes, khi, klo, sizes).
    """
    from surel_plus_tpu.spg.spg import SpGKeys

    seeds = np.asarray(seeds, dtype=np.int32)
    n = len(seeds)
    if bucket is None:
        bucket = num_walks * num_steps + 1
    walk_ops.enc_field_layout(num_walks, num_steps)  # validate bit budget

    t0 = time.time()
    indptr, indices = device_graph(graph)
    root = jax.random.PRNGKey(seed)
    sseed = seed if shuffle_seed is None else shuffle_seed
    shuffled = shuffled_indices_for(graph, sseed)
    etab, stab = walk_tables_for(graph, sseed)

    nblocks = (n + block_size - 1) // block_size
    nodes_b, sizes_b, hi_b, lo_b = [], [], [], []
    for b in range(nblocks):
        lo_i, hi_i = b * block_size, min((b + 1) * block_size, n)
        blk = seeds[lo_i:hi_i]
        if len(blk) < block_size:
            blk = np.concatenate(
                [blk, np.zeros(block_size - len(blk), np.int32)])
        nodes, sizes, hi, lo = walk_ops.sample_block(
            indptr, indices, shuffled, jnp.asarray(blk),
            jax.random.fold_in(root, b + 1),
            num_walks=num_walks, num_steps=num_steps, bucket=bucket,
            etab=etab, stab=stab)
        nodes_b.append(nodes)
        sizes_b.append(sizes)
        hi_b.append(hi)
        lo_b.append(lo)
    cat = (lambda xs: jnp.concatenate(xs)[:n]) if nblocks > 1 \
        else (lambda xs: xs[0][:n])
    out = SpGKeys(nodes=cat(nodes_b), khi=cat(hi_b), klo=cat(lo_b),
                  sizes=cat(sizes_b), num_walks=num_walks,
                  num_steps=num_steps)
    log.info("sample_gsets_device_keys: n=%d bucket=%d dispatched %.2fs",
             n, bucket, time.time() - t0)
    return out


def subg_matrix_device_keys(graph: CSRGraph, seeds: np.ndarray,
                            num_walks: int = 200, num_steps: int = 4,
                            seed: int = 111413,
                            bucket: Optional[int] = None,
                            block_size: int = DEFAULT_BLOCK):
    """CLI-convention wrapper over sample_gsets_device_keys."""
    return sample_gsets_device_keys(graph, seeds, num_walks, num_steps - 1,
                                    seed=seed, bucket=bucket,
                                    block_size=block_size)


def subg_matrix_device(graph: CSRGraph, seeds: np.ndarray,
                       num_walks: int = 200, num_steps: int = 4,
                       seed: int = 111413,
                       bucket: Optional[int] = None,
                       block_size: int = DEFAULT_BLOCK):
    """CLI-convention wrapper over sample_gsets_device."""
    return sample_gsets_device(graph, seeds, num_walks, num_steps - 1,
                               seed=seed, bucket=bucket,
                               block_size=block_size)


def subg_matrix(graph: CSRGraph, seeds: np.ndarray, num_walks: int = 200,
                num_steps: int = 4, seed: int = 111413,
                bucket: Optional[int] = None,
                block_size: int = DEFAULT_BLOCK) -> SpG:
    """Reference-CLI convention wrapper (random_walks.py:74-82): walks have
    `num_steps - 1` steps, encodings have `num_steps` columns."""
    return sample_gsets(graph, seeds, num_walks, num_steps - 1, seed=seed,
                        bucket=bucket, block_size=block_size)
