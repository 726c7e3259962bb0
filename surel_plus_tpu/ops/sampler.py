"""Host driver for set sampling: block pipeline + global encoding dedup.

Equivalent of `subg_matrix` (reference sampler/random_walks.py:74-82) plus
the compression stage of `gset_sampler` (subg_acc.c:900-1009): runs the
jitted per-block device kernel over fixed-size seed blocks, then dedups the
bit-packed structural encodings globally and assembles an `SpG`.

Conventions follow the reference CLI: `num_steps=S` means walks of S-1 steps
and an encoding of S columns (random_walks.py:77-78 passes num_steps-1).
"""

from __future__ import annotations

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


def sample_gsets(
    graph: CSRGraph,
    seeds: np.ndarray,
    num_walks: int,
    num_steps: int,
    seed: int = 111413,
    bucket: Optional[int] = None,
    block_size: int = DEFAULT_BLOCK,
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
    shift = int(num_walks).bit_length()
    if num_steps * shift + 1 > 64:
        raise ValueError("encoding key exceeds 64 bits; reduce num_walks "
                         "or num_steps (matches C assertion subg_acc.c:913)")

    t0 = time.time()
    indptr, indices = graph.device()
    root = jax.random.PRNGKey(seed)
    shuffled = walk_ops.shuffle_csr_rows(indptr, indices,
                                         jax.random.fold_in(root, 0))

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
            num_walks=num_walks, num_steps=num_steps, bucket=bucket)
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


def subg_matrix(graph: CSRGraph, seeds: np.ndarray, num_walks: int = 200,
                num_steps: int = 4, seed: int = 111413,
                bucket: Optional[int] = None,
                block_size: int = DEFAULT_BLOCK) -> SpG:
    """Reference-CLI convention wrapper (random_walks.py:74-82): walks have
    `num_steps - 1` steps, encodings have `num_steps` columns."""
    return sample_gsets(graph, seeds, num_walks, num_steps - 1, seed=seed,
                        bucket=bucket, block_size=block_size)
