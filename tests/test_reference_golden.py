"""Golden tests against the REFERENCE C sampler (built as an external
oracle from /root/reference/subg_acc — never copied into this repo).

On deterministic graphs, walks are RNG-independent, so the reference and
this framework must produce IDENTICAL sets, landing counts, and dedup
classes:

  * directed chain i -> i+1: every walk is the path i, i+1, ..., i+S
  * leaf nodes (out-degree 1 into a sink): same property locally

Skipped when the oracle cannot be built (non-hermetic environments).
"""

import os
import subprocess
import sys

import numpy as np
import pytest

ORACLE_DIR = "/tmp/subg_build"
REF_SRC = "/root/reference/subg_acc"


def _oracle():
    if not os.path.isdir(REF_SRC):
        pytest.skip("reference source unavailable")
    if not any(f.endswith(".so") for f in
               (os.listdir(ORACLE_DIR) if os.path.isdir(ORACLE_DIR)
                else [])):
        os.makedirs(ORACLE_DIR, exist_ok=True)
        subprocess.run(f"cp -r {REF_SRC}/* {ORACLE_DIR}/", shell=True,
                       check=True)
        r = subprocess.run([sys.executable, "setup.py", "build_ext",
                            "--inplace"], cwd=ORACLE_DIR,
                           capture_output=True)
        if r.returncode != 0:
            pytest.skip(f"oracle build failed: {r.stderr[-200:]}")
    sys.path.insert(0, ORACLE_DIR)
    import subg_acc
    return subg_acc


def _chain_csr(n):
    """Directed chain 0->1->...->n-1 (last node is a sink)."""
    indptr = np.concatenate([np.arange(n, dtype=np.int32),
                             [n - 1]]).astype(np.int32)
    indices = np.arange(1, n, dtype=np.int32)
    return indptr, indices


def test_chain_exact_parity():
    subg_acc = _oracle()
    from surel_plus_tpu.graph.csr import CSRGraph
    from surel_plus_tpu.ops.sampler import sample_gsets

    n, M, S = 32, 6, 3
    indptr, indices = _chain_csr(n)
    seeds = np.arange(n, dtype=np.int32)

    nsize, remap, enc = subg_acc.gset_sampler(
        indptr, indices, seeds, num_walks=M, num_steps=S, seed=7)

    g = CSRGraph(indptr=indptr, indices=indices)
    ours = sample_gsets(g, seeds, num_walks=M, num_steps=S, seed=3,
                        block_size=n)

    deg = np.diff(indptr)

    # identical set sizes and set membership per seed. Degree-0 seeds are
    # excluded from the node-id check: the C kernel `continue`s before
    # writing nidx for them (subg_acc.c:753-761), so the reference's
    # stored node id is uninitialized memory — we store the root instead.
    np.testing.assert_array_equal(np.asarray(nsize), ours.sizes)
    off = 0
    for i in range(n):
        if deg[i] > 0:
            ref_nodes = np.sort(remap[0][off:off + nsize[i]])
            got_nodes = ours.nodes[i][:ours.sizes[i]]
            np.testing.assert_array_equal(ref_nodes, got_nodes)
        off += nsize[i]

    # identical landing-count rows per (seed, node) — compare through each
    # side's own dedup table (ids may be permuted between implementations)
    ref_rows = {}
    off = 0
    for i in range(n):
        for j in range(nsize[i]):
            node = remap[0][off + j]
            ref_rows[(i, node)] = tuple(enc[remap[1][off + j]])
        off += nsize[i]
    for i in range(n):
        if deg[i] == 0:
            # well-defined part only: the degree-0 count row is M at every
            # column (subg_acc.c:756-759)
            got = tuple(int(v) for v in ours.enc[ours.eidx[i, 0]])
            assert got == tuple([M] * (S + 1))
            continue
        for j in range(ours.sizes[i]):
            node = int(ours.nodes[i, j])
            got = tuple(int(v) for v in ours.enc[ours.eidx[i, j]])
            assert ref_rows[(i, node)] == got, (i, node)

    # identical number of unique encodings (dedup classes agree)
    assert enc.shape[0] == ours.num_unique_enc


def test_chain_exact_parity_device_keys():
    """The packed-key device path unpacks to the same counts."""
    _oracle()  # ensures environment parity context; values checked vs host
    import jax.numpy as jnp

    from surel_plus_tpu.graph.csr import CSRGraph
    from surel_plus_tpu.ops.join import unpack_key_features
    from surel_plus_tpu.ops.sampler import (sample_gsets,
                                            sample_gsets_device_keys)

    n, M, S = 32, 6, 3
    indptr, indices = _chain_csr(n)
    g = CSRGraph(indptr=indptr, indices=indices)
    seeds = np.arange(n, dtype=np.int32)
    host = sample_gsets(g, seeds, num_walks=M, num_steps=S, seed=3,
                        block_size=n)
    spgk = sample_gsets_device_keys(g, seeds, num_walks=M, num_steps=S,
                                    seed=3, block_size=n)
    feats = np.asarray(unpack_key_features(spgk.khi, spgk.klo, M, S)) * M
    want = host.enc[host.eidx]
    np.testing.assert_allclose(feats, want, rtol=1e-6)
