"""Pure-XLA bitonic merge network (ops/merge_net.py): exact join parity
vs the lax.sort merge on real sampled data, link and hyperedge."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from surel_plus_tpu.graph.synthetic import rmat_graph
from surel_plus_tpu.ops import merge_net
from surel_plus_tpu.ops.join import make_keys_hjoin, make_keys_join
from surel_plus_tpu.ops.merge_net import merge_pairs_xla, merge_pairs_xor
from surel_plus_tpu.ops.sampler import sample_gsets_device_keys


@pytest.mark.parametrize("merge_fn", [merge_pairs_xla, merge_pairs_xor])
def test_merge_pairs_matches_lax_sort(merge_fn):
    rng = np.random.default_rng(0)
    for (b, la, lb) in ((16, 301, 301), (8, 7, 19), (4, 128, 64)):
        # unique keys per side (the join's rows are unique), tag split
        ka = np.sort(np.stack([rng.choice(1 << 20, la, replace=False)
                               for _ in range(b)]), axis=1)
        kb = np.sort(np.stack([rng.choice(1 << 20, lb, replace=False)
                               for _ in range(b)]), axis=1)
        ka = (ka.astype(np.uint32) << 1)
        kb = (kb.astype(np.uint32) << 1) | 1
        pa = rng.integers(0, 1 << 31, (b, la)).astype(np.uint32)
        pb = rng.integers(0, 1 << 31, (b, lb)).astype(np.uint32)
        mk, mp = merge_fn(jnp.asarray(ka), jnp.asarray(pa),
                          jnp.asarray(kb), jnp.asarray(pb))
        rk, rp = jax.lax.sort(
            (jnp.concatenate([ka, kb], axis=1),
             jnp.concatenate([pa, pb], axis=1)), num_keys=1)
        np.testing.assert_array_equal(np.asarray(mk), np.asarray(rk))
        np.testing.assert_array_equal(np.asarray(mp), np.asarray(rp))


@pytest.fixture(scope="module")
def spgk():
    g = rmat_graph(400, 3200, seed=3)
    return sample_gsets_device_keys(
        g, np.arange(400, dtype=np.int32), num_walks=8, num_steps=3,
        seed=3, block_size=400)


def _joined_cmp(j0, j1):
    np.testing.assert_array_equal(np.asarray(j0.mask), np.asarray(j1.mask))
    np.testing.assert_array_equal(np.asarray(j0.eidx), np.asarray(j1.eidx))
    if j0.kown is not None:
        np.testing.assert_array_equal(np.asarray(j0.kown),
                                      np.asarray(j1.kown))
        # merged-order planes: compare under their masks (pad-slot
        # payload order among equal sentinel keys is unspecified)
        for plane, msk in ((j0.kcross, j0.kcross_mask),
                           (j1.kcross, j1.kcross_mask)):
            assert plane is not None and msk is not None
        m0 = np.asarray(j0.kcross_mask).astype(bool)
        m1 = np.asarray(j1.kcross_mask).astype(bool)
        np.testing.assert_array_equal(m0, m1)
        k0 = np.asarray(j0.kcross)
        k1 = np.asarray(j1.kcross)
        sel = m0.any(axis=0) if m0.ndim == 3 else m0
        np.testing.assert_array_equal(np.where(sel, k0, 0),
                                      np.where(sel, k1, 0))


@pytest.mark.parametrize("impl", ["rot", "xor"])
def test_merge_join_score_twice(spgk, monkeypatch, impl):
    """Regression: the SECOND execution of a merge-enabled compiled
    program must not fail. With SENTINEL as a module-level jnp.uint32
    (a device array), the traced pad constant became an embedded buffer
    of the executable and the second call's fastpath dropped it:
    'Execution supplied 11 buffers but compiled program expected 12'
    on plain CPU — the true root cause of the r2-r4 'tunnel poisoning'
    (misattributed first to Pallas, then to the rotate-compare-select
    pattern)."""
    from surel_plus_tpu.models import Net
    from surel_plus_tpu.train.device import TrainConfig, trainer_from_keys

    monkeypatch.setattr(merge_net, "FORCE_MERGE_NET", impl)
    model = Net(input_dim=3, hidden_dim=16, aggrs="mean",
                dtype="bfloat16")
    t = trainer_from_keys(
        model, spgk, TrainConfig(batch_size=32, lr=1e-3, epochs=1,
                                 eval_steps=1, early_stop=-1, seed=0))
    rng = np.random.default_rng(0)
    edges = rng.integers(0, 400, (2, 64)).astype(np.int32)
    params, _ = t.init(jax.random.PRNGKey(0), edges[:, :32])
    s1 = np.asarray(t.predict(params, edges))
    s2 = np.asarray(t.predict(params, edges))   # second exec, same program
    np.testing.assert_array_equal(s1, s2)


@pytest.mark.parametrize("impl", ["rot", "xor"])
def test_join_parity_link_and_hyper(spgk, monkeypatch, impl):
    rng = np.random.default_rng(1)
    edges = jnp.asarray(rng.integers(0, 400, (2, 32)).astype(np.int32))
    hedges = jnp.asarray(rng.integers(0, 400, (3, 32)).astype(np.int32))
    join = make_keys_join(8, 3)
    hjoin = make_keys_hjoin(8, 3)
    args = (spgk.nodes, spgk.khi, spgk.klo, spgk.sizes)

    monkeypatch.setattr(merge_net, "FORCE_MERGE_NET", False)  # lax.sort
    j0 = join(*args, edges)
    hj0 = hjoin(*args, hedges)
    monkeypatch.setattr(merge_net, "FORCE_MERGE_NET", impl)
    j1 = join(*args, edges)
    hj1 = hjoin(*args, hedges)
    _joined_cmp(j0, j1)
    _joined_cmp(hj0, hj1)
