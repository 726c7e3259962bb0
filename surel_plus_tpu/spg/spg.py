"""SpG: sparse set storage, TPU-native padded-dense layout.

The reference stores sampled node sets as a gsize x gsize scipy CSR matrix
whose row u holds set S_u with 1-based encoding indices as values
(sampler/random_walks.py:79-81) and a separately deduped encoding table with
a prepended zero row so value 0 means "absent" (random_walks.py:81,
train.py:33-37).

The TPU layout replaces CSR with fixed-width padded tiles so batch gathers,
set joins, and segment reductions are static-shaped device ops:

  nodes: int32 [n, L]  per-row unique node ids, ascending, pad = INT32_MAX
  eidx:  int32 [n, L]  1-based index into `enc` (0 = padding / absent)
  sizes: int32 [n]     true set sizes
  enc:   int32 [U+1, ncol]  deduped landing-count table, row 0 all-zero

Rows are keyed by *position in `seeds`*; `row_lookup` maps node id -> row.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np


@dataclasses.dataclass
class SpG:
    nodes: np.ndarray   # int32 [n, L], ascending per row, pad INT32_MAX
    eidx: np.ndarray    # int32 [n, L], 0 = absent
    sizes: np.ndarray   # int32 [n]
    enc: np.ndarray     # int32 [U+1, ncol], row 0 = zeros
    seeds: np.ndarray   # int32 [n] node id of each row
    num_walks: int
    num_steps: int      # walk steps S' (ncol = S' + 1)
    _row_lookup: Optional[np.ndarray] = None

    @property
    def num_rows(self) -> int:
        return self.nodes.shape[0]

    @property
    def bucket(self) -> int:
        return self.nodes.shape[1]

    @property
    def ncol(self) -> int:
        return self.enc.shape[1]

    @property
    def num_unique_enc(self) -> int:
        return self.enc.shape[0] - 1

    def row_lookup(self, num_nodes: Optional[int] = None) -> np.ndarray:
        """int32[num_nodes] mapping node id -> SpG row (-1 if unsampled)."""
        if self._row_lookup is None:
            if num_nodes is None:
                num_nodes = int(self.seeds.max()) + 1
            lut = np.full(num_nodes, -1, dtype=np.int32)
            lut[self.seeds] = np.arange(self.num_rows, dtype=np.int32)
            object.__setattr__(self, "_row_lookup", lut)
        return self._row_lookup

    def enc_normalized(self, dtype=np.float32) -> np.ndarray:
        """Encoding table as landing probabilities (main.py:174 divides the
        raw counts by num_walks before feeding the model)."""
        return (self.enc.astype(dtype) / dtype(self.num_walks))

    def device(self):
        """Move the padded arrays to the default device as jnp arrays."""
        import jax.numpy as jnp

        return SpGDevice(
            nodes=jnp.asarray(self.nodes),
            eidx=jnp.asarray(self.eidx),
            sizes=jnp.asarray(self.sizes),
            enc=jnp.asarray(self.enc_normalized()),
        )

    def to_scipy(self, num_nodes: Optional[int] = None):
        """Export the reference CSR form: row u = S_u, value = 1-based enc
        index (sampler/random_walks.py:79). For parity tests."""
        import scipy.sparse as sp

        if num_nodes is None:
            num_nodes = int(max(self.seeds.max(), self.nodes[
                self.nodes < np.iinfo(np.int32).max].max())) + 1
        valid = np.arange(self.bucket)[None, :] < self.sizes[:, None]
        rows = np.repeat(self.seeds, self.sizes.astype(np.int64))
        cols = self.nodes[valid]
        vals = self.eidx[valid]
        return sp.csr_matrix((vals, (rows, cols)),
                             shape=(num_nodes, num_nodes))


@dataclasses.dataclass
class SpGDevice:
    """Device-resident SpG: jnp arrays, enc pre-normalized to float32."""

    nodes: "object"
    eidx: "object"
    sizes: "object"
    enc: "object"


@dataclasses.dataclass
class SpGKeys:
    """Device-resident SpG carrying packed landing-count keys per slot
    instead of encoding-table indices: joins unpack count features on the
    fly (five shift-and-masks), skipping the global dedup stage entirely.

    khi/klo: uint32 [n, L], the enc_field_layout bit-packs; key 0 == the
    zero encoding (absent), matching the reference's prepended zero row.
    """

    nodes: "object"   # int32 [n, L] ascending, pad INT32_MAX
    khi: "object"     # uint32 [n, L]
    klo: "object"     # uint32 [n, L]
    sizes: "object"   # int32 [n]
    num_walks: int
    num_steps: int
