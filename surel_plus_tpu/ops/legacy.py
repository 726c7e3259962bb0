"""SUREL-v1 legacy API surface, TPU-native.

The reference C extension exports four functions beyond the SUREL+ set
sampler; two power the legacy walk pipeline and two are exposed-but-unused
API surface (SURVEY.md §2.1). All are reproduced here over the same padded
device kernels as the SUREL+ path:

  walk_sampler  (subg_acc.c:316-389)  raw walks + per-seed RPE
  rpe_encoder   (subg_acc.c:249-314)  folded into walk_sampler's outputs
  rw_matrix     (random_walks.py:56-71) SpG from deduped RPE rows
  np_sampling   (random_walks.py:35-45) batched walk_sampler driver
  batch_sampler (subg_acc.c:391-507)  union node set for a query batch
  walk_join     (subg_acc.c:509-647)  per-query walk-slot index pairs
"""

from __future__ import annotations

import logging
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from surel_plus_tpu.graph.csr import CSRGraph
from surel_plus_tpu.ops import walk as walk_ops

log = logging.getLogger(__name__)


def gen_batch(iterable, n: int = 1, keep: bool = False):
    """Batch iterator (reference random_walks.py:25-32: `keep` retains the
    final partial batch)."""
    length = len(iterable)
    stop = length if keep else length - n
    for ndx in range(0, stop, n):
        yield iterable[ndx:min(ndx + n, length)]


def walk_sampler(graph: CSRGraph, seeds: np.ndarray, num_walks: int = 100,
                 num_steps: int = 3, replacement: bool = True,
                 seed: int = 111413, bucket: Optional[int] = None,
                 block_size: int = 65536):
    """Raw random walks with relative positional encodings.

    Returns (walks [n, num_walks*(num_steps+1)] int32 — root included at
    each walk's position 0 — and (nodes [n, L], counts [n, L, S+1],
    sizes [n]) padded RPE arrays). `replacement=False` selects the
    without-replacement first hop (C `random_walk_wo`, subg_acc.c:183-247).
    """
    seeds = np.asarray(seeds, dtype=np.int32)
    n = len(seeds)
    if bucket is None:
        bucket = num_walks * num_steps + 1
    from surel_plus_tpu.ops.sampler import (device_graph,
                                            shuffled_indices_for)

    indptr, indices = device_graph(graph)
    root_key = jax.random.PRNGKey(seed)
    shuffled = (indices if replacement
                else shuffled_indices_for(graph, seed))

    walks_h = np.empty((n, num_walks * (num_steps + 1)), np.int32)
    nodes_h = np.empty((n, bucket), np.int32)
    counts_h = np.empty((n, bucket, num_steps + 1), np.int32)
    sizes_h = np.empty((n,), np.int32)
    nblocks = (n + block_size - 1) // block_size
    for b in range(nblocks):
        lo, hi = b * block_size, min((b + 1) * block_size, n)
        blk = seeds[lo:hi]
        if len(blk) < block_size:
            blk = np.concatenate([blk, np.zeros(block_size - len(blk),
                                                np.int32)])
        walks, nodes, counts, sizes = walk_ops.walk_block_with_rpe(
            indptr, indices, shuffled, jnp.asarray(blk),
            jax.random.fold_in(root_key, b + 1), num_walks=num_walks,
            num_steps=num_steps, bucket=bucket, replacement=replacement)
        m = hi - lo
        walks_h[lo:hi] = np.asarray(walks).reshape(block_size, -1)[:m]
        nodes_h[lo:hi] = np.asarray(nodes)[:m]
        counts_h[lo:hi] = np.asarray(counts)[:m]
        sizes_h[lo:hi] = np.asarray(sizes)[:m]
    return walks_h, (nodes_h, counts_h, sizes_h)


def np_sampling(graph: CSRGraph, seeds: np.ndarray, bsize: int,
                num_walks: int = 200, num_steps: int = 4,
                seed: int = 111413):
    """Batched walk_sampler driver (random_walks.py:35-45): concatenated
    unique node keys + stacked count rows across seeds."""
    _, (nodes, counts, sizes) = walk_sampler(
        graph, seeds, num_walks=num_walks, num_steps=num_steps,
        replacement=True, seed=seed, block_size=bsize)
    valid = np.arange(nodes.shape[1])[None, :] < sizes[:, None]
    return nodes[valid], counts[valid], sizes


def rw_matrix(graph: CSRGraph, seeds: np.ndarray, num_walks: int = 200,
              num_steps: int = 4, seed: int = 111413,
              reduced: bool = True):
    """Legacy SpG builder (random_walks.py:56-71): walks *with* replacement
    at step 0, full-count-row dedup (the fastremap radix projection),
    1-based values, prepended zero row. CLI convention: num_steps=S means
    S-1 walk steps."""
    import scipy.sparse as sp

    keys, freqs, sizes = np_sampling(graph, seeds, bsize=65536,
                                     num_walks=num_walks,
                                     num_steps=num_steps - 1, seed=seed)
    gsize = graph.num_nodes
    if reduced:
        # dedup count rows; row values already bounded by num_walks, so the
        # (num_walks+1)-radix projection is an exact row key
        proj = np.array([(num_walks + 1) ** i
                         for i in reversed(range(num_steps))],
                        dtype=np.int64)
        idy = freqs.astype(np.int64) @ proj
        uniq, inv = np.unique(idy, return_inverse=True)
        first = np.zeros(len(uniq), dtype=np.int64)
        np.minimum.at(first, inv, np.arange(len(idy)))
        freqs = freqs[first]
        idy = inv.astype(np.int64)
    else:
        idy = np.arange(len(freqs), dtype=np.int64)
    rows = np.repeat(seeds, sizes.astype(np.int64))
    z = sp.csr_matrix((idy + 1, (rows, keys)), shape=(gsize, gsize))
    freqs = np.concatenate([np.zeros((1, num_steps), freqs.dtype), freqs])
    return z, freqs


def batch_sampler(graph: CSRGraph, query_nodes: np.ndarray,
                  num_walks: int = 100, num_steps: int = 3,
                  seed: int = 111413, thld: Optional[int] = None):
    """Union node set over a batch of query seeds with an adaptive budget
    (C batch_sampler, subg_acc.c:391-507): walks from every seed, one
    deduped union capped at `thld` (default num_walks*num_steps+1 per
    seed). Returns (union_nodes ascending, per-seed walks [n, M, S'])."""
    query_nodes = np.asarray(query_nodes, dtype=np.int32)
    if thld is None:
        thld = (num_walks * num_steps + 1) * len(query_nodes)
    from surel_plus_tpu.ops.sampler import (device_graph,
                                            shuffled_indices_for)

    indptr, indices = device_graph(graph)
    key = jax.random.PRNGKey(seed)
    shuffled = shuffled_indices_for(graph, seed)
    walks = walk_ops._walk_block(indptr, indices, shuffled,
                                 jnp.asarray(query_nodes), num_walks,
                                 num_steps, jax.random.fold_in(key, 1))
    walks = np.asarray(walks)
    union = np.unique(np.concatenate([query_nodes, walks.ravel()]))
    if len(union) > thld:
        log.warning("batch_sampler: union %d exceeds budget %d; truncating",
                    len(union), thld)
        union = union[:thld]
    return union, walks


def _walk_join_device(walks: jax.Array, queries: jax.Array):
    """Jitted walk_join core: row sorts + dedup-rank cumsum + batched
    search — the repo's standard sort-based join idiom, no host loop.

    walks [n, W] int32; queries [2, B] row ids -> (left, right) [B, W]
    1-based indices into the partner's unique node list (0 = absent),
    in the original walk-slot order."""
    from surel_plus_tpu.ops.walk import rows_searchsorted

    sw = jnp.sort(walks, axis=1)                     # [n, W]
    first = jnp.concatenate(
        [jnp.ones_like(sw[:, :1], bool), sw[:, 1:] != sw[:, :-1]],
        axis=1)
    rank = jnp.cumsum(first, axis=1).astype(jnp.int32)   # dedup rank

    def side(qa, qb):
        wa = walks[qa]                               # [B, W] row gather
        swb = sw[qb]
        rkb = rank[qb]
        pos = rows_searchsorted(swb, wa)
        cpos = jnp.minimum(pos, swb.shape[1] - 1)
        hit = jnp.take_along_axis(swb, cpos, axis=1) == wa
        return jnp.where(hit,
                         jnp.take_along_axis(rkb, cpos, axis=1), 0)

    return side(queries[0], queries[1]), side(queries[1], queries[0])


def walk_join(walks: np.ndarray, seeds: np.ndarray,
              queries: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """SUREL-v1 online join (C walk_join, subg_acc.c:509-647): for each
    query (u, v), map every node slot of u's walks to its index in v's
    unique node list (0 if absent) and vice versa.

    walks: [n, M*(S+1)] raw walks of `seeds`; queries: [2, B] into seeds'
    rows. Returns (left [B, W], right [B, W]) remap indices, W = walk
    width. r5: device implementation (`_walk_join_device` — row sorts +
    dedup-rank + lane-vectorized search), replacing the r1-r4 host
    per-query numpy loop; tests pin it against that loop's semantics."""
    left, right = jax.jit(_walk_join_device)(
        jnp.asarray(walks, dtype=jnp.int32),
        jnp.asarray(queries, dtype=jnp.int32))
    return np.asarray(left), np.asarray(right)
