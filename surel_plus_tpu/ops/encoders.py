"""Metric-path structure encoders: DEG / SPD / PPR scalar features.

Reference `encoding()` (utils.py:20-39): transforms a sparse score matrix
(typically the top-k PPR matrix) into per-(seed, node) scalar structural
features; the scalar itself is the model input (enc table = None,
num_steps=1 — main.py:183,196).

Host-side scipy prep (cold path, one-shot per run), then converted to the
padded ScalarSpG device layout for TPU joins.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np

from surel_plus_tpu.ops.walk import INT32_MAX


def encoding(x, adj, kind: str = "DEG"):
    """x: CSR score matrix (e.g. topk PPR); adj: CSR adjacency.
    Returns (x_transformed, agg_or_None) like utils.py:20-39."""
    import scipy.sparse as sp
    from sklearn.preprocessing import normalize

    agg = None
    if kind == "DEG":
        x = x + normalize(adj, norm="l1", axis=1)
        x_deg = np.log(x.getnnz(axis=1) + 1)
        agg = x.copy()
        x.data = (x > 0).multiply(x_deg).tocsr().data.astype(x.data.dtype)
    elif kind == "SPD":
        x0 = x > 0
        x1 = adj > 0
        x2 = x1 ** 2
        x = x1 + x0.multiply(x2 * 0.5) + x0 * 0.3
        x = sp.csr_matrix(x)
        x.setdiag(2.3)
    elif kind == "PPR":
        x = x.copy()
        x.data = (x.data + 0.1) / (x.data.max() + 0.1)
    else:
        raise NotImplementedError(kind)
    return x, agg


@dataclasses.dataclass
class ScalarSpG:
    """Padded scalar-valued set storage for the PPR/SPD/DEG paths:
    per-row sorted node ids with one float feature each (instead of an
    encoding-table index)."""

    nodes: np.ndarray    # int32 [n, L] ascending, pad INT32_MAX
    values: np.ndarray   # float32 [n, L], pad 0
    sizes: np.ndarray    # int32 [n]
    seeds: np.ndarray    # int32 [n]

    @property
    def bucket(self) -> int:
        return self.nodes.shape[1]

    def device(self):
        """Device layout compatible with LinkPredictor: the `eidx` slot
        carries float values and `enc` is a dummy (the scalar path needs
        no table)."""
        import jax.numpy as jnp

        from surel_plus_tpu.spg.spg import SpGDevice

        return SpGDevice(nodes=jnp.asarray(self.nodes),
                         eidx=jnp.asarray(self.values),
                         sizes=jnp.asarray(self.sizes),
                         enc=jnp.zeros((1, 1), jnp.float32))


def scalar_spg_from_csr(mat, seeds: Optional[np.ndarray] = None,
                        bucket: Optional[int] = None) -> ScalarSpG:
    """Convert a scipy CSR score matrix (row = seed's set, col = node,
    value = scalar feature) into the padded layout."""
    mat = mat.tocsr()
    mat.sort_indices()
    n = mat.shape[0]
    sizes = np.diff(mat.indptr).astype(np.int32)
    L = bucket if bucket is not None else int(sizes.max()) if n else 0
    nodes = np.full((n, L), INT32_MAX, np.int32)
    values = np.zeros((n, L), np.float32)
    # vectorized padded scatter (a per-row Python loop is O(N)
    # interpreter work — minutes at citation2's 2.9M rows)
    row_of = np.repeat(np.arange(n, dtype=np.int64), sizes)
    off = (np.arange(mat.nnz, dtype=np.int64)
           - np.repeat(mat.indptr[:-1].astype(np.int64), sizes))
    keep = off < L
    nodes[row_of[keep], off[keep]] = mat.indices[keep]
    values[row_of[keep], off[keep]] = mat.data[keep]
    sizes = np.minimum(sizes, L)
    if seeds is None:
        seeds = np.arange(n, dtype=np.int32)
    return ScalarSpG(nodes=nodes, values=values, sizes=sizes,
                     seeds=np.asarray(seeds, np.int32))


def gather_join_scalar(nodes, values, sizes, edges):
    """Scalar-feature SpJoin (the encode=None branch of train.py:39-43):
    pairs each set element's own score with the partner endpoint's score
    (0 if absent). Returns a JoinedBatch whose eidx field carries float
    value pairs [2, B, L, 2]."""
    import jax.numpy as jnp

    from surel_plus_tpu.ops.join import JoinedBatch

    rows_nodes = nodes[edges]
    rows_vals = values[edges]
    rows_sizes = sizes[edges]
    nu, nv = rows_nodes[0], rows_nodes[1]
    vu, vv = rows_vals[0], rows_vals[1]
    cross_u = _cross_lookup_f(nu, nv, vv)
    cross_v = _cross_lookup_f(nv, nu, vu)
    vals = jnp.stack([
        jnp.stack([vu, cross_u], axis=-1),
        jnp.stack([vv, cross_v], axis=-1),
    ])
    mask = rows_nodes != INT32_MAX
    return JoinedBatch(eidx=vals, mask=mask, sizes=rows_sizes)


def _cross_lookup_f(nodes_a, nodes_b, vals_b):
    """Float-valued variant of join._cross_lookup (merge-join based)."""
    from surel_plus_tpu.ops.join import _cross_lookup_multi

    return _cross_lookup_multi(nodes_a, nodes_b, vals_b)[0]
