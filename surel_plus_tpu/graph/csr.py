"""Immutable CSR graph container.

TPU-first equivalent of the reference's `scipy.sparse.csr_matrix` graphs
(reference: dataloader.py:118-138 builds `G = A + A^T` CSR with int32 node
ids; subg_acc.c:663-676 consumes raw `indptr`/`indices` int32 arrays).

Host arrays are numpy; `.device()` places them in HBM as jnp arrays. Node ids
are int32 throughout (the reference caps ids at int32: subg_acc.c:740-741).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np


@dataclasses.dataclass(frozen=True)
class CSRGraph:
    """Compressed sparse row adjacency.

    indptr:  int32[N+1]
    indices: int32[E]   (column ids; sorted within each row)
    data:    optional float32[E] edge weights (None => unweighted)
    """

    indptr: np.ndarray
    indices: np.ndarray
    data: Optional[np.ndarray] = None

    @property
    def num_nodes(self) -> int:
        return len(self.indptr) - 1

    @property
    def num_edges(self) -> int:
        return len(self.indices)

    def degrees(self) -> np.ndarray:
        return np.diff(self.indptr)

    def neighbors(self, u: int) -> np.ndarray:
        return self.indices[self.indptr[u]:self.indptr[u + 1]]

    def has_edge(self, u: int, v: int) -> bool:
        row = self.neighbors(u)
        i = np.searchsorted(row, v)
        return bool(i < len(row) and row[i] == v)

    def device(self):
        """Return (indptr, indices) as device arrays (jnp int32, HBM)."""
        import jax.numpy as jnp

        return jnp.asarray(self.indptr), jnp.asarray(self.indices)

    def to_scipy(self):
        import scipy.sparse as sp

        data = self.data if self.data is not None else np.ones(
            self.num_edges, dtype=np.float32)
        n = self.num_nodes
        return sp.csr_matrix((data, self.indices, self.indptr), shape=(n, n))

    @staticmethod
    def from_scipy(mat) -> "CSRGraph":
        mat = mat.tocsr()
        mat.sort_indices()
        return CSRGraph(
            indptr=np.asarray(mat.indptr, dtype=np.int32),
            indices=np.asarray(mat.indices, dtype=np.int32),
            data=np.asarray(mat.data, dtype=np.float32),
        )


# above this edge count the C++/OpenMP counting-sort builder
# (native/graphkit.cpp:build_csr_w) replaces the numpy lexsort path —
# same semantics (duplicate weights summed, rows ascending), O(E) not
# O(E log E), parallel.
NATIVE_BUILD_THRESHOLD = 2_000_000


def coalesce_edge_list(edges: np.ndarray, weights: np.ndarray):
    """Deduplicate directed (u, v) pairs summing weights, sorted by (u, v)
    — the torch_sparse.coalesce semantics the reference applies to the
    train edge list before mask splitting (dataloader.py:41-45)."""
    edges = np.asarray(edges, dtype=np.int64)
    weights = np.asarray(weights)
    order = np.lexsort((edges[:, 1], edges[:, 0]))
    e, w = edges[order], weights[order]
    if not len(e):
        return e, w
    new = np.empty(len(e), dtype=bool)
    new[0] = True
    new[1:] = (e[1:, 0] != e[:-1, 0]) | (e[1:, 1] != e[:-1, 1])
    seg = np.cumsum(new) - 1
    w_out = np.bincount(seg, weights=w).astype(weights.dtype)
    return e[new], w_out


def csr_from_edges(
    edges: np.ndarray,
    num_nodes: Optional[int] = None,
    weights: Optional[np.ndarray] = None,
    symmetrize: bool = True,
    coalesce: bool = True,
    drop_self_loops: bool = True,
    prefer_native: Optional[bool] = None,
) -> CSRGraph:
    """Build a CSR graph from an edge list of shape [E, 2].

    Mirrors the reference pipeline `csr_matrix(...) ; G = A + A^T` with
    zero-diagonal assertion (dataloader.py:118-138): symmetrize sums weights
    of (u,v) and (v,u); coalesce sums duplicate entries.

    `prefer_native=None` auto-selects the native O(E) builder above
    NATIVE_BUILD_THRESHOLD edges; True/False force either path.
    """
    edges = np.asarray(edges, dtype=np.int64)
    if prefer_native is None:
        prefer_native = len(edges) >= NATIVE_BUILD_THRESHOLD
    if prefer_native and len(edges) and int(edges.max()) < 2**31 - 1:
        from surel_plus_tpu.graph.native import build_csr_weighted_native
        g = build_csr_weighted_native(
            edges, weights=weights, num_nodes=num_nodes,
            symmetrize=symmetrize, coalesce=coalesce,
            drop_self_loops=drop_self_loops)
        if g is not None:
            return g
    if edges.ndim != 2 or edges.shape[1] != 2:
        raise ValueError(f"edges must be [E, 2], got {edges.shape}")
    if num_nodes is None:
        num_nodes = int(edges.max()) + 1 if len(edges) else 0
    if weights is None:
        weights = np.ones(len(edges), dtype=np.float32)
    else:
        weights = np.asarray(weights, dtype=np.float32)

    src, dst, w = edges[:, 0], edges[:, 1], weights
    if symmetrize:
        src, dst = np.concatenate([src, dst]), np.concatenate([dst, src])
        w = np.concatenate([w, w])
    if drop_self_loops:
        keep = src != dst
        src, dst, w = src[keep], dst[keep], w[keep]

    # sort by (src, dst) once; CSR rows come out column-sorted.
    order = np.lexsort((dst, src))
    src, dst, w = src[order], dst[order], w[order]

    if coalesce and len(src):
        key_new = np.empty(len(src), dtype=bool)
        key_new[0] = True
        key_new[1:] = (src[1:] != src[:-1]) | (dst[1:] != dst[:-1])
        seg = np.cumsum(key_new) - 1
        w = np.bincount(seg, weights=w).astype(np.float32)
        src, dst = src[key_new], dst[key_new]

    indptr = np.zeros(num_nodes + 1, dtype=np.int64)
    np.add.at(indptr, src + 1, 1)
    indptr = np.cumsum(indptr)
    return CSRGraph(
        indptr=indptr.astype(np.int32),
        indices=dst.astype(np.int32),
        data=w,
    )
