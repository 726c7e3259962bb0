"""Device-native personalized PageRank (VERDICT r4 item 7).

The reference computes PPR with a host Numba push (sampler/pprgo.py:
9-62); our production default is the C++/OpenMP port (native/ppr.cpp).
Both are output-sensitive sequential pushes — great on CPUs, hostile to
TPUs. This module computes the SAME scores on device via bounded
truncated power iteration,

    pi(seed) = alpha * sum_t (1-alpha)^t  e_seed P^t,   P = D^-1 A,

which converges to the push fixed point (residual mass decays as
(1-alpha)^T; T is chosen so the tail is below the requested tolerance).
Degree-0 nodes drop their outgoing mass exactly as the push does
(ppr.cpp:64 `continue`).

TPU mapping — no scatters, no per-element gathers in the hot loop:
  * the SpMV x -> x P over a seed BLOCK is one [E]-row gather of the
    [N, S] state in CSR order (row gathers run at the issue rate,
    CLAUDE.md), followed by a segment sum expressed as cumsum +
    indptr-boundary row gathers + prefix diff — the repo's standard
    sort/cumsum idiom, no scatter anywhere;
  * the iteration is a lax.scan of T steps, one XLA program per seed
    block; top-k per row via lax.top_k on the final [S, N] scores.

This is eps-faithful (tests/test_ppr.py parity vs the C++ push) but
per-seed costs O(T*E) streamed work versus push's output-sensitive
O(topk*deg/eps) — so for all-N precompute at citation2 scale the host
push remains the default engine; the device path serves seed SUBSETS
(e.g. query endpoints only) and toolchain-free environments. Measured
rates at a citation2-class N are recorded in CLAUDE.md (r5).
"""

from __future__ import annotations

import functools
from typing import Tuple

import numpy as np

import jax
import jax.numpy as jnp


def _num_iters(alpha: float, tol: float) -> int:
    """Smallest T with (1-alpha)^(T+1) <= tol (residual tail bound)."""
    if alpha >= 1.0:
        return 1
    return max(1, int(np.ceil(np.log(tol) / np.log1p(-alpha))) + 1)


@functools.partial(jax.jit, static_argnames=("alpha", "n_iters", "topk"))
def _ppr_block(indptr, indices, inv_deg, e0, alpha: float,
               n_iters: int, topk: int):
    """One seed block. e0: [N, S] one-hot seed columns. Returns
    (scores [S, topk], nodes [S, topk]) sorted descending per seed."""
    n = inv_deg.shape[0]

    def spmv(x):
        # y = (x * 1/deg) gathered per edge in CSR order, then summed
        # per destination row: x P for symmetric A.
        y = x * inv_deg[:, None]                     # [N, S]
        rows = y[indices]                            # [E, S] row gather
        c = jnp.cumsum(rows, axis=0)                 # tree scan: f32-safe
        cz = jnp.concatenate([jnp.zeros_like(c[:1]), c], axis=0)
        b = cz[indptr]                               # [N+1, S] row gather
        return b[1:] - b[:-1]                        # [N, S]

    def step(x, _):
        return alpha * e0 + (1.0 - alpha) * spmv(x), None

    x, _ = jax.lax.scan(step, alpha * e0, None, length=n_iters)
    scores, nodes = jax.lax.top_k(x.T, min(topk, n))  # [S, topk]
    return scores, nodes


def ppr_topk_device(indptr: np.ndarray, indices: np.ndarray,
                    seeds: np.ndarray, alpha: float, eps: float,
                    topk: int, block: int = 16,
                    tol: float | None = None
                    ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Drop-in device analog of `ops.ppr.ppr_topk` (same return contract:
    nodes [S, topk], scores [S, topk], counts [S]; zero-score slots are
    not counted). `tol` defaults to alpha*eps — the push's per-unit-degree
    residual threshold — so scores agree with the C++ push to the same
    order the push truncates at."""
    indptr = np.ascontiguousarray(indptr, np.int32)
    indices = np.ascontiguousarray(indices, np.int32)
    seeds = np.ascontiguousarray(seeds, np.int32)
    n = len(indptr) - 1
    deg = (indptr[1:] - indptr[:-1]).astype(np.float32)
    with np.errstate(divide="ignore"):
        inv_deg = np.where(deg > 0, 1.0 / np.maximum(deg, 1), 0.0)
    n_iters = _num_iters(alpha, tol if tol is not None else alpha * eps)

    d_indptr = jnp.asarray(indptr)
    d_indices = jnp.asarray(indices)
    d_inv_deg = jnp.asarray(inv_deg.astype(np.float32))

    out_nodes = np.zeros((len(seeds), topk), np.int32)
    out_scores = np.zeros((len(seeds), topk), np.float32)
    for lo in range(0, len(seeds), block):
        sel = seeds[lo:lo + block]
        s = len(sel)
        e0 = np.zeros((n, block), np.float32)
        e0[sel, np.arange(s)] = 1.0
        scores, nodes = _ppr_block(d_indptr, d_indices, d_inv_deg,
                                   jnp.asarray(e0), float(alpha),
                                   n_iters, topk)
        out_scores[lo:lo + s] = np.asarray(scores[:s, :topk])
        out_nodes[lo:lo + s] = np.asarray(nodes[:s, :topk])
    # top_k is descending, so valid (positive) entries are a prefix
    valid = out_scores > 0
    counts = valid.sum(axis=1).astype(np.int32)
    out_nodes = np.where(valid, out_nodes, 0)
    out_scores = np.where(valid, out_scores, 0.0)
    return out_nodes, out_scores, counts
