"""Native (C++/OpenMP) graph-ingest fast paths via ctypes.

Counting-sort CSR construction and per-row shuffling for billion-edge
ingest (native/graphkit.cpp). Falls back to the numpy paths when the
toolchain is unavailable.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
from typing import Optional

import numpy as np

from surel_plus_tpu.graph.csr import CSRGraph

log = logging.getLogger(__name__)

_LIB = None
_LIB_FAILED = False


def _native_lib():
    global _LIB, _LIB_FAILED
    if _LIB is not None or _LIB_FAILED:
        return _LIB
    root = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    src = os.path.join(root, "native", "graphkit.cpp")
    so = os.path.join(root, "native", "libgraphkit.so")
    try:
        if (not os.path.exists(so)
                or os.path.getmtime(so) < os.path.getmtime(src)):
            subprocess.run(
                ["g++", "-O3", "-march=native", "-shared", "-fPIC",
                 "-fopenmp", "-std=c++17", src, "-o", so],
                check=True, capture_output=True)
        lib = ctypes.CDLL(so)
        lib.build_csr.restype = ctypes.c_int64
        lib.build_csr.argtypes = [
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int64, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int32)]
        lib.build_csr_w.restype = ctypes.c_int64
        lib.build_csr_w.argtypes = [
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int32,
            ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_float)]
        lib.shuffle_rows.restype = None
        lib.shuffle_rows.argtypes = [
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int32, ctypes.c_uint64,
            ctypes.POINTER(ctypes.c_int32)]
        _LIB = lib
    except Exception as exc:
        log.warning("native graphkit unavailable (%s)", exc)
        _LIB_FAILED = True
    return _LIB


def _p32(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def _p64(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))


def build_csr_native(edges: np.ndarray, num_nodes: Optional[int] = None,
                     symmetrize: bool = True,
                     drop_self_loops: bool = True) -> Optional[CSRGraph]:
    """O(E) parallel CSR build (duplicates kept, rows sorted).
    Returns None when the native library is unavailable."""
    lib = _native_lib()
    if lib is None:
        return None
    edges = np.ascontiguousarray(edges, np.int32)
    if num_nodes is None:
        num_nodes = int(edges.max()) + 1 if len(edges) else 0
    src = np.ascontiguousarray(edges[:, 0])
    dst = np.ascontiguousarray(edges[:, 1])
    cap = len(edges) * (2 if symmetrize else 1)
    if cap >= 2**31:
        # indptr is downcast to int32 below; >2^31-1 entries would
        # silently overflow — let the (int64-safe) numpy path handle it
        return None
    indptr = np.zeros(num_nodes + 1, np.int64)
    indices = np.zeros(cap, np.int32)
    total = lib.build_csr(_p32(src), _p32(dst), len(edges), num_nodes,
                          int(symmetrize), int(drop_self_loops),
                          _p64(indptr), _p32(indices))
    return CSRGraph(indptr=indptr.astype(np.int32),
                    indices=indices[:total])


def build_csr_weighted_native(
        edges: np.ndarray, weights: Optional[np.ndarray] = None,
        num_nodes: Optional[int] = None, symmetrize: bool = True,
        coalesce: bool = True,
        drop_self_loops: bool = True) -> Optional[CSRGraph]:
    """O(E) parallel weighted CSR build with duplicate coalescing —
    semantics identical to the numpy `csr_from_edges` path (sum of
    duplicate-edge weights, rows sorted ascending). Returns None when the
    native library is unavailable."""
    lib = _native_lib()
    if lib is None:
        return None
    edges = np.ascontiguousarray(edges, np.int32)
    if num_nodes is None:
        num_nodes = int(edges.max()) + 1 if len(edges) else 0
    src = np.ascontiguousarray(edges[:, 0])
    dst = np.ascontiguousarray(edges[:, 1])
    if weights is None:
        wptr = ctypes.POINTER(ctypes.c_float)()
    else:
        weights = np.ascontiguousarray(weights, np.float32)
        wptr = weights.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
    cap = len(edges) * (2 if symmetrize else 1)
    if cap >= 2**31:
        return None  # int32 indptr downcast would overflow (see above)
    indptr = np.zeros(num_nodes + 1, np.int64)
    indices = np.zeros(cap, np.int32)
    wout = np.zeros(cap, np.float32)
    total = lib.build_csr_w(
        _p32(src), _p32(dst), wptr, len(edges), num_nodes, int(symmetrize),
        int(drop_self_loops), int(coalesce), _p64(indptr), _p32(indices),
        wout.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    return CSRGraph(indptr=indptr.astype(np.int32),
                    indices=indices[:total].copy(),
                    data=wout[:total].copy())


def shuffle_rows_native(graph: CSRGraph, seed: int) -> Optional[np.ndarray]:
    """Per-row uniform shuffle of CSR indices. None if unavailable."""
    lib = _native_lib()
    if lib is None:
        return None
    indptr64 = np.ascontiguousarray(graph.indptr, np.int64)
    indices = np.ascontiguousarray(graph.indices, np.int32)
    out = np.empty_like(indices)
    lib.shuffle_rows(_p64(indptr64), _p32(indices), graph.num_nodes,
                     np.uint64(seed), _p32(out))
    return out
