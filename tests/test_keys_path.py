"""Packed-key SpG path: keys-join features must exactly equal the
table-join features (enc_norm[eidx] == unpack(key)), and the keys trainer
must train."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from surel_plus_tpu.graph.synthetic import rmat_graph
from surel_plus_tpu.models import Net
from surel_plus_tpu.ops.join import gather_join, make_keys_join
from surel_plus_tpu.ops.sampler import (
    sample_gsets_device, sample_gsets_device_keys)
from surel_plus_tpu.train import TrainConfig
from surel_plus_tpu.train.device import trainer_from_keys

M, S = 16, 3


@pytest.fixture(scope="module")
def both():
    g = rmat_graph(300, 1500, seed=7)
    seeds = np.arange(g.num_nodes, dtype=np.int32)
    dev, u = sample_gsets_device(g, seeds, num_walks=M, num_steps=S,
                                 seed=3, block_size=128, enc_width=64)
    spgk = sample_gsets_device_keys(g, seeds, num_walks=M, num_steps=S,
                                    seed=3, block_size=128)
    return dev, spgk


def test_keys_join_matches_table_join(both):
    dev, spgk = both
    rng = np.random.default_rng(0)
    edges = jnp.asarray(rng.integers(0, 300, size=(2, 32)).astype(np.int32))
    table_out = gather_join(dev.nodes, dev.eidx, dev.sizes, edges)
    table_feats = dev.enc[table_out.eidx]         # [2, B, L, 2, ncol]
    kjoin = make_keys_join(M, S)
    keys_out = kjoin(spgk.nodes, spgk.khi, spgk.klo, spgk.sizes, edges)
    np.testing.assert_array_equal(np.asarray(table_out.mask),
                                  np.asarray(keys_out.mask))
    np.testing.assert_allclose(np.asarray(table_feats),
                               np.asarray(keys_out.eidx), rtol=1e-6)


def test_keys_hjoin_matches_table(both):
    from surel_plus_tpu.ops.join import hgather_join, make_keys_hjoin

    dev, spgk = both
    rng = np.random.default_rng(2)
    hedges = jnp.asarray(rng.integers(0, 300, size=(3, 8)).astype(np.int32))
    table_out = hgather_join(dev.nodes, dev.eidx, dev.sizes, hedges)
    table_feats = dev.enc[table_out.eidx]        # [4, B, L, 2, ncol]
    hjoin = make_keys_hjoin(M, S)
    keys_out = hjoin(spgk.nodes, spgk.khi, spgk.klo, spgk.sizes, hedges)
    np.testing.assert_array_equal(np.asarray(table_out.mask),
                                  np.asarray(keys_out.mask))
    np.testing.assert_array_equal(np.asarray(table_out.sizes),
                                  np.asarray(keys_out.sizes))
    np.testing.assert_allclose(np.asarray(table_feats),
                               np.asarray(keys_out.eidx), rtol=1e-6)


def test_keys_trainer_trains(both):
    dev, spgk = both
    cfg = TrainConfig(batch_size=64, lr=3e-3)
    model = Net(input_dim=S + 1, hidden_dim=16, aggrs="mean", dropout=0.0)
    tr = trainer_from_keys(model, spgk, cfg)
    rng = np.random.default_rng(1)
    E = 256
    pos_u = rng.integers(0, 300, E // 2)
    edges = np.stack([
        np.concatenate([pos_u, rng.integers(0, 300, E - E // 2)]),
        np.concatenate([pos_u, rng.integers(0, 300, E - E // 2)]),
    ]).astype(np.int32)
    labels = np.concatenate([np.ones(E // 2),
                             np.zeros(E - E // 2)]).astype(np.float32)
    params, opt_state = tr.init(jax.random.PRNGKey(0), edges[:, :64])
    ed, ld = jnp.asarray(edges), jnp.asarray(labels)
    params, opt_state, losses, aucs = tr.fit(params, opt_state, ed, ld,
                                             jax.random.PRNGKey(1), 6)
    assert float(losses[-1]) < float(losses[0])
    assert float(aucs[-1]) > 0.8


def test_keys_join_hi_lo_layout_matches_table():
    """Field layouts that overflow the lo word (num_walks=2048: shift=12,
    lead_bit=44) take the two-word merge path: features still match the
    table join exactly, and the fused-kernel planes are absent so the
    model falls back to the XLA path."""
    from surel_plus_tpu.ops.walk import enc_field_layout

    M2 = 2048
    assert enc_field_layout(M2, S)[2] >= 32  # truly hi+lo
    g = rmat_graph(120, 600, seed=9)
    seeds = np.arange(g.num_nodes, dtype=np.int32)
    dev, u = sample_gsets_device(g, seeds, num_walks=M2, num_steps=S,
                                 seed=3, block_size=64, enc_width=256,
                                 max_enc_width=4096)
    spgk = sample_gsets_device_keys(g, seeds, num_walks=M2, num_steps=S,
                                    seed=3, block_size=64)
    rng = np.random.default_rng(0)
    edges = jnp.asarray(rng.integers(0, 120, size=(2, 16)).astype(np.int32))
    table_out = gather_join(dev.nodes, dev.eidx, dev.sizes, edges)
    table_feats = dev.enc[table_out.eidx]
    keys_out = make_keys_join(M2, S)(spgk.nodes, spgk.khi, spgk.klo,
                                     spgk.sizes, edges)
    assert keys_out.kown is None and keys_out.kcross is None
    np.testing.assert_array_equal(np.asarray(table_out.mask),
                                  np.asarray(keys_out.mask))
    np.testing.assert_allclose(np.asarray(table_feats),
                               np.asarray(keys_out.eidx), rtol=1e-6)

    model = Net(input_dim=S + 1, hidden_dim=8, aggrs="mean",
                fused_hidden=True, key_layout=(M2, S))
    enc0 = jnp.zeros((1, 1), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), enc0, keys_out)
    out = model.apply(params, enc0, keys_out)
    assert np.isfinite(np.asarray(out)).all()
