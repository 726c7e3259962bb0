from surel_plus_tpu.graph.csr import CSRGraph, csr_from_edges
from surel_plus_tpu.graph.synthetic import rmat_graph, ring_of_cliques, erdos_renyi

__all__ = [
    "CSRGraph",
    "csr_from_edges",
    "rmat_graph",
    "ring_of_cliques",
    "erdos_renyi",
]
