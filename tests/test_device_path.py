"""Device-resident pipeline tests: device dedup == host dedup, device
metrics == numpy metrics, device epochs train."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from surel_plus_tpu.graph.synthetic import rmat_graph
from surel_plus_tpu.models import Net
from surel_plus_tpu.ops import metrics as host_metrics
from surel_plus_tpu.ops.sampler import sample_gsets, sample_gsets_device
from surel_plus_tpu.train import TrainConfig
from surel_plus_tpu.train.device import (
    DeviceTrainer, device_auc, device_hits_at_k, device_mrr,
    evaluate_device)

M, S = 16, 3


@pytest.fixture(scope="module")
def setup():
    g = rmat_graph(300, 1500, seed=7)
    seeds = np.arange(g.num_nodes, dtype=np.int32)
    host = sample_gsets(g, seeds, num_walks=M, num_steps=S, seed=3,
                        block_size=128)
    dev, u = sample_gsets_device(g, seeds, num_walks=M, num_steps=S,
                                 seed=3, block_size=128, enc_width=64)
    return g, host, dev, u


def test_device_matches_host_dedup(setup):
    g, host, dev, u = setup
    assert u == host.num_unique_enc
    np.testing.assert_array_equal(np.asarray(dev.nodes), host.nodes)
    np.testing.assert_array_equal(np.asarray(dev.sizes), host.sizes)
    np.testing.assert_array_equal(np.asarray(dev.eidx), host.eidx)
    np.testing.assert_allclose(np.asarray(dev.enc)[:u + 1],
                               host.enc_normalized()[:u + 1], rtol=1e-6)


def test_device_auc_matches_numpy():
    rng = np.random.default_rng(0)
    labels = (rng.random(500) < 0.5).astype(np.float32)
    scores = np.round(rng.random(500).astype(np.float32), 2)  # ties
    want = host_metrics.roc_auc(labels, scores)
    got = float(device_auc(jnp.asarray(labels), jnp.asarray(scores)))
    assert got == pytest.approx(want, abs=1e-5)
    # weighted variant ignores masked entries
    w = np.ones(500, np.float32)
    w[400:] = 0
    want2 = host_metrics.roc_auc(labels[:400], scores[:400])
    got2 = float(device_auc(jnp.asarray(labels), jnp.asarray(scores),
                            jnp.asarray(w)))
    assert got2 == pytest.approx(want2, abs=1e-5)


def test_device_hits_mrr():
    pos = np.array([0.9, 0.5, 0.1], np.float32)
    neg = np.array([0.8, 0.6, 0.4, 0.2], np.float32)
    got = float(device_hits_at_k(jnp.asarray(pos), jnp.asarray(neg), 2))
    assert got == pytest.approx(host_metrics.hits_at_k(pos, neg, 2))
    posm = np.array([0.9, 0.3], np.float32)
    negm = np.array([[0.5, 0.4], [0.5, 0.4]], np.float32)
    got = float(device_mrr(jnp.asarray(posm), jnp.asarray(negm)))
    assert got == pytest.approx(host_metrics.mrr(posm, negm))


def test_device_trainer_epoch(setup):
    g, host, dev, u = setup
    cfg = TrainConfig(batch_size=128, lr=3e-3)
    model = Net(input_dim=S + 1, hidden_dim=32, aggrs="mean", dropout=0.1)
    trainer = DeviceTrainer(model, dev, cfg)

    rng = np.random.default_rng(0)
    E = 700  # not a multiple of batch -> padded tail exercised
    pos_u = rng.integers(0, 300, E // 2)
    edges = np.stack([
        np.concatenate([pos_u, rng.integers(0, 300, E - E // 2)]),
        np.concatenate([pos_u, rng.integers(0, 300, E - E // 2)]),
    ]).astype(np.int32)
    # make positives self-pairs (trivially learnable signal: identical sets)
    labels = np.concatenate([np.ones(E // 2), np.zeros(E - E // 2)]
                            ).astype(np.float32)

    params, opt_state = trainer.init(jax.random.PRNGKey(0), edges[:, :128])
    ed, ld = jnp.asarray(edges), jnp.asarray(labels)
    losses, aucs = [], []
    key = jax.random.PRNGKey(1)
    for i in range(8):
        key, sub = jax.random.split(key)
        params, opt_state, loss, auc = trainer.train_epoch(
            params, opt_state, ed, ld, sub)
        losses.append(float(loss))
        aucs.append(float(auc))
    assert losses[-1] < losses[0]
    assert aucs[-1] > 0.8, aucs

    # multi-epoch fit program agrees in kind: loss keeps decreasing
    p2, o2, losses, aucs = trainer.fit(params, opt_state, ed, ld,
                                       jax.random.PRNGKey(5), 3)
    assert losses.shape == (3,) and aucs.shape == (3,)
    assert float(losses[-1]) <= float(losses[0]) + 1e-3

    # device evaluation end-to-end
    inf = {"valid": (edges[:, :64], edges[:, 350:414]),
           "test": (edges[:, 64:128], edges[:, 414:478])}
    res, _ = evaluate_device(trainer, params, inf, "Hits@50")
    assert set(res) == {"Hits@10", "Hits@20", "Hits@50", "Hits@100"}
    (auc_t, auc_v, auc_te), _ = evaluate_device(trainer, params, inf, "AUC")
    assert 0.0 <= auc_te <= 1.0
    mrr_res, _ = evaluate_device(trainer, params, inf, "MRR")
    assert 0.0 < mrr_res[2] <= 1.0


def test_dedup_widens_past_max_without_flat_cliff():
    """When unique encodings exceed max_enc_width the widen loop keeps
    going (pairwise merge tree at wide levels) instead of falling back to
    serializing 1-D flat sorts; results still match the host dedup."""
    g = rmat_graph(400, 3000, seed=11)
    seeds = np.arange(g.num_nodes, dtype=np.int32)
    host = sample_gsets(g, seeds, num_walks=M, num_steps=S, seed=5,
                        block_size=128)
    # force repeated widening: start tiny and cap max_enc_width below the
    # true unique count so the loop must continue past the "max"
    assert host.num_unique_enc > 32
    dev, u = sample_gsets_device(g, seeds, num_walks=M, num_steps=S,
                                 seed=5, block_size=128, enc_width=8,
                                 max_enc_width=16)
    assert u == host.num_unique_enc
    np.testing.assert_array_equal(np.asarray(dev.eidx), host.eidx)
    np.testing.assert_allclose(np.asarray(dev.enc)[:u + 1],
                               host.enc_normalized()[:u + 1], rtol=1e-6)


def test_balanced_predict_matches_plain(setup):
    """Width-classed scoring == full-width scoring exactly (truncation to
    a class width >= max endpoint set size is lossless)."""
    g, host, dev, u = setup
    cfg = TrainConfig(batch_size=64, lr=1e-3)
    net = Net(input_dim=S + 1, hidden_dim=16, dropout=0.0)
    tr = DeviceTrainer(net, dev, cfg)
    rng = np.random.default_rng(0)
    edges = rng.integers(0, g.num_nodes, size=(2, 200)).astype(np.int32)
    params, _ = tr.init(jax.random.PRNGKey(0), edges[:, :64])
    bucket = dev.nodes.shape[1]
    classes = (8, 16, max(32, bucket))
    plain = np.asarray(tr.predict(params, edges))
    bal = np.asarray(tr.predict_balanced(params, edges, classes))
    np.testing.assert_allclose(bal, plain, rtol=1e-5, atol=1e-6)
    groups = tr.partition_by_width(edges, classes)
    assert sum(len(sel) for _, sel in groups) == edges.shape[1]
    assert any(len(sel) for _, sel in groups[:-1]), \
        "test graph should exercise at least one small class"


def test_balanced_training_grad_parity(setup):
    """The balanced trainer's only math change vs full width is running
    the join/model on a width-sliced SpG. For queries whose sets fit in
    the class width, the TRAINING step (loss + grads) at the sliced width
    must equal the full-width one — this is the invariant that makes
    fit_balanced a pure retiling, not a different optimization."""
    import optax

    g, host, dev, u = setup
    cfg = TrainConfig(batch_size=64, lr=1e-3)
    net = Net(input_dim=S + 1, hidden_dim=16, dropout=0.0)
    tr = DeviceTrainer(net, dev, cfg)
    rng = np.random.default_rng(3)
    edges = rng.integers(0, g.num_nodes, size=(2, 200)).astype(np.int32)
    params, _ = tr.init(jax.random.PRNGKey(0), edges[:, :64])

    bucket = dev.nodes.shape[1]
    L = 16
    groups = dict(tr.partition_by_width(edges, (L, max(32, bucket))))
    sel = groups[L]
    assert len(sel) >= 4, "need a nonempty small class"
    be = jnp.asarray(edges[:, sel])
    bl = jnp.asarray((rng.random(len(sel)) < 0.5).astype(np.float32))

    def loss_and_grads(sarr_c):
        def loss_fn(p):
            joined = tr._join2(sarr_c, be)
            logits = tr.train_model.apply(
                p, tr._enc_of(sarr_c), joined, None, train=True,
                rngs={"dropout": jax.random.PRNGKey(7)})
            return optax.sigmoid_binary_cross_entropy(logits, bl).mean()
        return jax.value_and_grad(loss_fn)(params)

    loss_f, grads_f = loss_and_grads(tr.sarr)
    loss_s, grads_s = loss_and_grads(tr._slice_sarr(tr.sarr, L))
    assert float(loss_s) == pytest.approx(float(loss_f), rel=1e-5)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6),
        grads_s, grads_f)


def test_balanced_fit_degenerate_matches_fit(setup):
    """With ONE class at full width and one batch per epoch (E == bs,
    dropout off), fit_balanced and fit run the same gradient steps — the
    in-batch permutations differ but a single weighted-mean step is
    order-invariant — so params/losses/aucs must match numerically."""
    g, host, dev, u = setup
    bs = 64
    cfg = TrainConfig(batch_size=bs, lr=1e-2)
    net = Net(input_dim=S + 1, hidden_dim=16, dropout=0.0)
    tr = DeviceTrainer(net, dev, cfg)
    rng = np.random.default_rng(4)
    edges = rng.integers(0, g.num_nodes, size=(2, bs)).astype(np.int32)
    labels = (rng.random(bs) < 0.5).astype(np.float32)
    params, opt_state = tr.init(jax.random.PRNGKey(0), edges)

    key = jax.random.PRNGKey(9)
    n_epochs = 3
    bucket = dev.nodes.shape[1]
    p1, _, l1, a1 = tr.fit(params, opt_state, jnp.asarray(edges),
                           jnp.asarray(labels), key, n_epochs)
    p2, _, l2, a2, _ = tr.fit_balanced(params, opt_state, edges, labels,
                                       key, n_epochs, classes=(bucket,))
    np.testing.assert_allclose(np.asarray(l2), np.asarray(l1),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(a2), np.asarray(a1),
                               rtol=1e-5, atol=1e-6)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6),
        p2, p1)


def test_balanced_fit_trains(setup):
    g, host, dev, u = setup
    cfg = TrainConfig(batch_size=64, lr=1e-2)
    net = Net(input_dim=S + 1, hidden_dim=16, dropout=0.0)
    tr = DeviceTrainer(net, dev, cfg)
    rng = np.random.default_rng(1)
    E = 256
    # learnable signal: positives are self-pairs (identical sets)
    pos_u = rng.integers(0, g.num_nodes, E // 2)
    edges = np.stack([
        np.concatenate([pos_u, rng.integers(0, g.num_nodes, E - E // 2)]),
        np.concatenate([pos_u, rng.integers(0, g.num_nodes, E - E // 2)]),
    ]).astype(np.int32)
    labels = np.concatenate([np.ones(E // 2), np.zeros(E - E // 2)]
                            ).astype(np.float32)
    params, opt_state = tr.init(jax.random.PRNGKey(0), edges[:, :64])
    bucket = dev.nodes.shape[1]
    params, opt_state, losses, aucs, groups = tr.fit_balanced(
        params, opt_state, edges, labels, jax.random.PRNGKey(2),
        n_epochs=8, classes=(8, 16, max(32, bucket)))
    assert losses.shape == (8,)
    assert float(losses[-1]) < float(losses[0])
