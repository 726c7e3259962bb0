"""SUREL+ for TPU: subgraph-based graph representation learning, rebuilt TPU-native.

A from-scratch JAX/XLA/Pallas framework with the capabilities of the reference
SUREL+ system (Graph-COM/SUREL_Plus, VLDB'23): walk-based node-set sampling,
structural encoding (LP / PPR / SPD / DEG), sparse set storage (SpG), online
set join (SpJoin), set neural encoders (mean / LSTM / attention), and
link / relation / higher-order pattern prediction — redesigned for TPU:
dense tiled layouts, static shapes, MXU-friendly batched compute, and
`jax.sharding` meshes instead of single-device CPU/CUDA pipelines.
"""

__version__ = "0.1.0"

from surel_plus_tpu.graph.csr import CSRGraph  # noqa: F401
from surel_plus_tpu.spg.spg import SpG  # noqa: F401
