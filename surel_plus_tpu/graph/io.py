"""Graph file IO: edge lists and npz archives.

The reference consumes edgelist files in its C-extension test
(subg_acc/test/test.py:15-22) and ships large graphs (twitter-follower,
criteo-click) as downloadable archives (README.md:28-48). These loaders
cover those formats hermetically.
"""

from __future__ import annotations

import numpy as np

from surel_plus_tpu.graph.csr import CSRGraph, csr_from_edges

INT32_LIMIT = np.iinfo(np.int32).max


def load_edgelist(path: str, comments: str = "#",
                  symmetrize: bool = True) -> CSRGraph:
    """Whitespace-separated `src dst` lines -> CSRGraph."""
    edges = np.loadtxt(path, comments=comments, dtype=np.int64, ndmin=2)
    if edges.shape[1] > 2:
        edges = edges[:, :2]
    return csr_from_edges(edges, symmetrize=symmetrize)


def save_graph_npz(path: str, graph: CSRGraph) -> None:
    np.savez_compressed(path, indptr=graph.indptr, indices=graph.indices,
                        data=(graph.data if graph.data is not None
                              else np.array([])))


def load_graph_npz(path: str) -> CSRGraph:
    z = np.load(path)
    data = z["data"] if z["data"].size else None
    g = CSRGraph(indptr=z["indptr"].astype(np.int32),
                 indices=z["indices"].astype(np.int32), data=data)
    check_int32_capacity(g)
    return g


def check_int32_capacity(graph: CSRGraph) -> None:
    """Single-chip kernels index edges with int32 (as does the reference,
    subg_acc.c:740-741). Graphs beyond 2^31-1 edges must be partitioned
    across the device mesh (parallel/dist.py) before sampling."""
    if graph.num_edges >= INT32_LIMIT:
        raise ValueError(
            f"graph has {graph.num_edges} edges >= int32 capacity; "
            "row-shard it across the mesh (parallel/dist.py) — each "
            "shard's edge count must fit int32")
