"""Top-k personalized PageRank set sampler.

Replaces the reference's Numba push-flow sampler (sampler/pprgo.py:9-111):
  * fast path: native C++/OpenMP Andersen push (native/ppr.cpp), compiled
    on demand and loaded via ctypes.
  * fallback: vectorized numpy frontier-push (small graphs / no toolchain).

`topk_ppr_matrix` reproduces the reference API incl. 'sym'/'col'/'row'
degree normalization (pprgo.py:83-111).
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
from typing import Tuple

import numpy as np

log = logging.getLogger(__name__)

_LIB = None
_LIB_FAILED = False


def _native_lib():
    global _LIB, _LIB_FAILED
    if _LIB is not None or _LIB_FAILED:
        return _LIB
    root = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    src = os.path.join(root, "native", "ppr.cpp")
    so = os.path.join(root, "native", "libppr.so")
    try:
        if (not os.path.exists(so)
                or os.path.getmtime(so) < os.path.getmtime(src)):
            subprocess.run(
                ["g++", "-O3", "-march=native", "-shared", "-fPIC",
                 "-fopenmp", "-std=c++17", src, "-o", so],
                check=True, capture_output=True)
        lib = ctypes.CDLL(so)
        lib.ppr_topk.restype = None
        lib.ppr_topk.argtypes = [
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int32, ctypes.POINTER(ctypes.c_int32), ctypes.c_int32,
            ctypes.c_float, ctypes.c_float, ctypes.c_int32, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int32),
        ]
        _LIB = lib
    except Exception as exc:  # toolchain missing -> numpy fallback
        log.warning("native PPR unavailable (%s); using numpy fallback", exc)
        _LIB_FAILED = True
    return _LIB


def _ppr_push_numpy(indptr, indices, seeds, alpha, eps, topk):
    """Per-seed Python dict/loop Andersen push — a SLOW correctness
    fallback for when the g++ toolchain is missing (the real
    implementation is native/ppr.cpp); fine for tests/toy graphs,
    pathological beyond that."""
    n = len(indptr) - 1
    deg = np.diff(indptr)
    out_nodes = np.zeros((len(seeds), topk), np.int32)
    out_scores = np.zeros((len(seeds), topk), np.float32)
    out_count = np.zeros(len(seeds), np.int32)
    for s, seed in enumerate(seeds):
        p = {}
        r = {int(seed): alpha}
        frontier = [int(seed)]
        while frontier:
            u = frontier.pop()
            res = r.get(u, 0.0)
            if res == 0.0:
                continue
            p[u] = p.get(u, 0.0) + res
            r[u] = 0.0
            du = deg[u]
            if du == 0:
                continue
            push = (1 - alpha) * res / du
            for v in indices[indptr[u]:indptr[u + 1]]:
                v = int(v)
                r[v] = r.get(v, 0.0) + push
                if r[v] >= alpha * eps * deg[v] and v not in frontier:
                    frontier.append(v)
        items = sorted(p.items(), key=lambda kv: -kv[1])[:topk]
        out_count[s] = len(items)
        for i, (v, val) in enumerate(items):
            out_nodes[s, i] = v
            out_scores[s, i] = val
    return out_nodes, out_scores, out_count


def ppr_topk(indptr: np.ndarray, indices: np.ndarray, seeds: np.ndarray,
             alpha: float, eps: float, topk: int, nthreads: int = -1
             ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Returns (nodes [S, topk], scores [S, topk], counts [S])."""
    indptr = np.ascontiguousarray(indptr, np.int32)
    indices = np.ascontiguousarray(indices, np.int32)
    seeds = np.ascontiguousarray(seeds, np.int32)
    lib = _native_lib()
    if lib is None:
        return _ppr_push_numpy(indptr, indices, seeds, alpha, eps, topk)
    n = len(indptr) - 1
    out_nodes = np.zeros((len(seeds), topk), np.int32)
    out_scores = np.zeros((len(seeds), topk), np.float32)
    out_count = np.zeros(len(seeds), np.int32)
    i32p = lambda a: a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))
    f32p = lambda a: a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
    lib.ppr_topk(i32p(indptr), i32p(indices), n, i32p(seeds),
                 len(seeds), alpha, eps, topk, nthreads,
                 i32p(out_nodes), f32p(out_scores), i32p(out_count))
    return out_nodes, out_scores, out_count


def topk_ppr_matrix(graph, alpha: float, eps: float, idx: np.ndarray,
                    topk: int, normalization: str = "row",
                    nthreads: int = -1, method: str = "host"):
    """Sparse [len(idx), N] CSR of top-k PPR scores (pprgo.py:83-111).

    method='host' (default): C++/OpenMP push (numpy fallback).
    method='device': TPU truncated power iteration (ops/ppr_device.py) —
    eps-faithful, best for seed subsets; host push wins for all-N
    precompute (see that module's docstring)."""
    import scipy.sparse as sp

    if method == "device":
        from surel_plus_tpu.ops.ppr_device import ppr_topk_device

        nodes, scores, counts = ppr_topk_device(
            graph.indptr, graph.indices, np.asarray(idx, np.int32),
            alpha, eps, topk)
    else:
        nodes, scores, counts = ppr_topk(graph.indptr, graph.indices,
                                         np.asarray(idx, np.int32), alpha,
                                         eps, topk, nthreads)
    n = graph.num_nodes
    rows = np.repeat(np.arange(len(idx)), counts)
    valid = np.arange(topk)[None, :] < counts[:, None]
    cols = nodes[valid]
    vals = scores[valid].astype(np.float64)

    deg = np.asarray(graph.to_scipy().sum(1)).ravel()
    if normalization == "sym":
        deg_sqrt = np.sqrt(np.maximum(deg, 1e-12))
        vals = deg_sqrt[np.asarray(idx)[rows]] * vals / deg_sqrt[cols]
    elif normalization == "col":
        vals = deg[np.asarray(idx)[rows]] * vals / np.maximum(deg[cols],
                                                              1e-12)
    elif normalization != "row":
        raise ValueError(f"Unknown PPR normalization: {normalization}")
    return sp.csr_matrix((vals, (rows, cols)), shape=(len(idx), n))
