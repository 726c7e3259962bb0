"""Fused key-unpack+hidden+set-sum Pallas kernel (interpret mode on CPU).

Covers u_core_rows (fields(k)^T @ U == unpack(k) @ W1), the raw kernel
forward + custom-VJP gradients vs the XLA reference, and the integration
into Net's mean path over a real packed-key join (reference
model.py:67,78)."""

import jax
import jax.numpy as jnp
import numpy as np

from surel_plus_tpu.graph.synthetic import rmat_graph
from surel_plus_tpu.models import Net
from surel_plus_tpu.ops.join import (
    JoinedBatch,
    make_keys_join,
    unpack_key_features,
)
from surel_plus_tpu.ops.pallas.hidden_sum_kernel import (
    NEG,
    fused_key_hidden_sum,
    u_core_rows,
)
from surel_plus_tpu.ops.sampler import sample_gsets_device_keys

NW, NS = 10, 3          # shift=4: starts {3:0, 2:4, 1:8}, lead_bit=12


def _rand_keys(rng, shape):
    """Random keys covering every field plus the root bit."""
    from surel_plus_tpu.ops.walk import enc_field_layout

    shift, starts, lead_bit = enc_field_layout(NW, NS)
    k = np.zeros(shape, np.uint32)
    for j in range(1, NS + 1):
        k |= rng.integers(0, NW + 1, size=shape).astype(
            np.uint32) << np.uint32(starts[j])
    k |= rng.integers(0, 2, size=shape).astype(
        np.uint32) << np.uint32(lead_bit)
    return k


SHIFT = int(NW).bit_length()


def _u_ext(w1, b1):
    return jnp.concatenate(
        [u_core_rows(w1, NW, NS),
         jnp.full((1, w1.shape[1]), NEG, jnp.float32), b1[None]],
        axis=0)


def _hid(k, w1, b1):
    feats = unpack_key_features(jnp.zeros_like(k), k, NW, NS)
    return jnp.maximum(feats @ w1 + b1, 0.0)


def _ref_sums(kown, mask_own, kcross, mask_cross, w1, b1):
    """XLA reference: own side masked per q + shared cross plane [B, Lc]
    selected by the per-q cross mask."""
    ho = _hid(kown, w1, b1)                          # [Q, B, Lo, H]
    hc = _hid(kcross, w1, b1)                        # [B, Lc, H]
    so = (ho * mask_own[..., None].astype(ho.dtype)).sum(axis=-2)
    sc = (hc[None] * mask_cross[..., None].astype(hc.dtype)).sum(axis=-2)
    return so + sc


def test_u_core_rows_matches_unpack():
    """fields(k)^T @ u_core_rows(W1) == unpack(k) @ W1 exactly."""
    rng = np.random.default_rng(0)
    k = _rand_keys(rng, (5, 7))
    w1 = jnp.asarray(rng.normal(size=(NS + 1, 6)).astype(np.float32))
    feats = unpack_key_features(jnp.zeros((5, 7), jnp.uint32),
                                jnp.asarray(k), NW, NS)
    want = np.asarray(feats @ w1)
    mask_f = (1 << SHIFT) - 1
    fields = np.stack(
        [(k >> np.uint32(i * SHIFT)) & (1 if i == NS else mask_f)
         for i in range(NS + 1)], axis=-1).astype(np.float32)
    got = fields @ np.asarray(u_core_rows(w1, NW, NS))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def _rand_case(rng, Q, B, L, Lc, H):
    kown = jnp.asarray(_rand_keys(rng, (Q, B, L)))
    kcross = jnp.asarray(_rand_keys(rng, (B, Lc)))
    mask = jnp.asarray(rng.random((Q, B, L)) < 0.7)
    # per-q disjoint selections of the shared plane, like tag-split rows
    pick = rng.integers(0, Q + 1, size=(B, Lc))      # Q = unselected
    mc = jnp.asarray(np.stack([pick == qi for qi in range(Q)]))
    w1 = jnp.asarray(rng.normal(size=(NS + 1, H)).astype(np.float32))
    b1 = jnp.asarray(rng.normal(size=(H,)).astype(np.float32))
    return kown, mask, kcross, mc, w1, b1


def test_fused_forward_matches_reference():
    rng = np.random.default_rng(1)
    # deliberately unaligned B and odd widths to exercise padding
    kown, mask, kcross, mc, w1, b1 = _rand_case(rng, 2, 11, 19, 38, 16)
    got = fused_key_hidden_sum(kown, mask, kcross, mc, _u_ext(w1, b1),
                               SHIFT, interpret=True)
    want = _ref_sums(kown, mask, kcross, mc, w1, b1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_fused_grads_match_reference():
    rng = np.random.default_rng(2)
    kown, mask, kcross, mc, w1, b1 = _rand_case(rng, 2, 8, 9, 18, 8)
    g = jnp.asarray(rng.normal(size=(2, 8, 8)).astype(np.float32))

    def loss_f(w, b):
        return (fused_key_hidden_sum(kown, mask, kcross, mc, _u_ext(w, b),
                                     SHIFT, interpret=True) * g).sum()

    def loss_r(w, b):
        return (_ref_sums(kown, mask, kcross, mc, w, b) * g).sum()

    gf = jax.grad(loss_f, argnums=(0, 1))(w1, b1)
    gr = jax.grad(loss_r, argnums=(0, 1))(w1, b1)
    np.testing.assert_allclose(np.asarray(gf[0]), np.asarray(gr[0]),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gf[1]), np.asarray(gr[1]),
                               rtol=1e-4, atol=1e-4)


def test_all_masked_set_is_zero():
    rng = np.random.default_rng(3)
    kown, _, kcross, mc, w1, b1 = _rand_case(rng, 2, 8, 5, 10, 8)
    mask = jnp.zeros((2, 8, 5), bool).at[:, 1:].set(True)
    mc = mc.at[:, 0].set(False)      # set 0: nothing selected anywhere
    got = fused_key_hidden_sum(kown, mask, kcross, mc, _u_ext(w1, b1),
                               SHIFT, interpret=True)
    np.testing.assert_allclose(np.asarray(got)[:, 0], 0.0, atol=1e-6)


def test_net_fused_matches_unfused_on_real_join():
    """Same params over a real sampled packed-key join: fused and XLA
    paths agree on logits and parameter gradients."""
    g = rmat_graph(200, 1000, seed=5)
    seeds = np.arange(g.num_nodes, dtype=np.int32)
    spgk = sample_gsets_device_keys(g, seeds, num_walks=NW, num_steps=NS,
                                    seed=3, block_size=64)
    rng = np.random.default_rng(4)
    edges = jnp.asarray(rng.integers(0, 200, size=(2, 24)).astype(np.int32))
    joined = make_keys_join(NW, NS)(spgk.nodes, spgk.khi, spgk.klo,
                                    spgk.sizes, edges)
    assert joined.kown is not None

    kw = dict(input_dim=NS + 1, hidden_dim=32, aggrs="mean",
              dtype="float32", key_layout=(NW, NS))
    m0 = Net(fused_hidden=False, **kw)
    m1 = Net(fused_hidden=True, **kw)
    enc = jnp.zeros((1, 1), jnp.float32)
    p0 = m0.init(jax.random.PRNGKey(0), enc, joined)
    p1 = m1.init(jax.random.PRNGKey(0), enc, joined)
    assert (jax.tree_util.tree_structure(p0)
            == jax.tree_util.tree_structure(p1))

    l0 = m0.apply(p0, enc, joined)
    l1 = m1.apply(p1, enc, joined)
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l0),
                               rtol=1e-5, atol=1e-5)

    g0 = jax.grad(lambda p: (m0.apply(p, enc, joined) ** 2).sum())(p0)
    g1 = jax.grad(lambda p: (m1.apply(p, enc, joined) ** 2).sum())(p1)
    for (k0, a), (k1, b) in zip(
            sorted(jax.tree_util.tree_leaves_with_path(g0),
                   key=lambda kv: str(kv[0])),
            sorted(jax.tree_util.tree_leaves_with_path(g1),
                   key=lambda kv: str(kv[0]))):
        assert str(k0) == str(k1)
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-4, atol=1e-5, err_msg=str(k0))


def test_trainer_from_keys_sets_key_layout():
    from surel_plus_tpu.train import TrainConfig
    from surel_plus_tpu.train.device import trainer_from_keys

    g = rmat_graph(100, 500, seed=6)
    spgk = sample_gsets_device_keys(
        g, np.arange(100, dtype=np.int32), num_walks=NW, num_steps=NS,
        seed=0, block_size=64)
    model = Net(input_dim=NS + 1, hidden_dim=16, aggrs="mean")
    tr = trainer_from_keys(model, spgk, TrainConfig(batch_size=8))
    assert tr.train_model.key_layout == (NW, NS)


def test_honet_fused_matches_unfused_on_real_hjoin():
    """4-group hyperedge join: fused HONet == XLA HONet (logits + grads)."""
    from surel_plus_tpu.models import HONet
    from surel_plus_tpu.ops.join import make_keys_hjoin

    g = rmat_graph(150, 800, seed=8)
    spgk = sample_gsets_device_keys(
        g, np.arange(150, dtype=np.int32), num_walks=NW, num_steps=NS,
        seed=2, block_size=64)
    rng = np.random.default_rng(5)
    hedges = jnp.asarray(
        rng.integers(0, 150, size=(3, 16)).astype(np.int32))
    joined = make_keys_hjoin(NW, NS)(spgk.nodes, spgk.khi, spgk.klo,
                                     spgk.sizes, hedges)
    assert joined.kown is not None and joined.kcross.shape[-1] \
        == 2 * joined.kown.shape[-1] * 2

    kw = dict(input_dim=NS + 1, hidden_dim=24, key_layout=(NW, NS))
    m0 = HONet(fused_hidden=False, **kw)
    m1 = HONet(fused_hidden=True, **kw)
    enc = jnp.zeros((1, 1), jnp.float32)
    p = m0.init(jax.random.PRNGKey(0), enc, joined)
    l0 = m0.apply(p, enc, joined)
    l1 = m1.apply(p, enc, joined)
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l0),
                               rtol=1e-5, atol=1e-5)
    g0 = jax.grad(lambda q: (m0.apply(q, enc, joined) ** 2).sum())(p)
    g1 = jax.grad(lambda q: (m1.apply(q, enc, joined) ** 2).sum())(p)
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-4, atol=1e-5)


def test_net_fused_slots_attn_lstm_match_unfused():
    """Per-slot fused variant: attn and lstm aggregators agree with the
    XLA path on logits and parameter gradients over a real join."""
    g = rmat_graph(200, 1000, seed=9)
    spgk = sample_gsets_device_keys(
        g, np.arange(200, dtype=np.int32), num_walks=NW, num_steps=NS,
        seed=1, block_size=64)
    rng = np.random.default_rng(6)
    edges = jnp.asarray(rng.integers(0, 200, size=(2, 12)).astype(np.int32))
    joined = make_keys_join(NW, NS)(spgk.nodes, spgk.khi, spgk.klo,
                                    spgk.sizes, edges)
    assert joined.kcross_al is not None

    for aggrs in ("attn", "lstm"):
        kw = dict(input_dim=NS + 1, hidden_dim=16, aggrs=aggrs,
                  dropout=0.0, dtype="float32", key_layout=(NW, NS))
        m0 = Net(fused_hidden=False, **kw)
        m1 = Net(fused_hidden=True, **kw)
        enc = jnp.zeros((1, 1), jnp.float32)
        p = m0.init(jax.random.PRNGKey(0), enc, joined)
        # the fused model additionally takes the Pallas recurrence
        # (fast=True, in-kernel BPTT) for lstm
        l0 = m0.apply(p, enc, joined)
        l1 = m1.apply(p, enc, joined)
        np.testing.assert_allclose(np.asarray(l1), np.asarray(l0),
                                   rtol=1e-5, atol=1e-5, err_msg=aggrs)
        rngs = {"dropout": jax.random.PRNGKey(1)}

        def loss(q, m):
            out = m.apply(q, enc, joined, None, train=True, rngs=rngs)
            return (out ** 2).sum()

        g0 = jax.grad(loss)(p, m0)
        g1 = jax.grad(loss)(p, m1)
        for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       rtol=1e-4, atol=1e-5,
                                       err_msg=aggrs)


def test_lstm_kernel_matches_scan():
    """Pallas LSTM final hidden == the XLA chunked-remat scan."""
    from surel_plus_tpu.models.layers import LSTMAggregation
    from surel_plus_tpu.ops.pallas.lstm_kernel import lstm_final_hidden

    rng = np.random.default_rng(7)
    B, L, h, H = 9, 23, 6, 8
    x = jnp.asarray(rng.normal(size=(B, L, h)).astype(np.float32))
    sizes = rng.integers(1, L + 1, size=B)
    mask = jnp.asarray(np.arange(L)[None, :] < sizes[:, None])

    agg = LSTMAggregation(H, chunk=5)
    params = agg.init(jax.random.PRNGKey(0), x, mask)
    want = agg.apply(params, x, mask)
    p = params["params"]
    got = lstm_final_hidden(x, mask, p["wi"], p["wh"], p["bh"],
                            interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-6)
    # module-level fast path wires the same kernel
    got2 = agg.apply(params, x, mask, fast=True)
    np.testing.assert_allclose(np.asarray(got2), np.asarray(want),
                               rtol=1e-5, atol=1e-6)


def test_balanced_predict_fused_matches_plain():
    """Width-classed scoring through the FUSED kernel (forced on, keys
    trainer) == plain full-width scoring — the width-sliced join planes
    feed the kernel correctly at every class width."""
    from surel_plus_tpu.train import TrainConfig
    from surel_plus_tpu.train.device import trainer_from_keys

    g = rmat_graph(300, 1500, seed=10)
    spgk = sample_gsets_device_keys(
        g, np.arange(300, dtype=np.int32), num_walks=NW, num_steps=NS,
        seed=4, block_size=128)
    cfg = TrainConfig(batch_size=64, lr=1e-3)
    rng = np.random.default_rng(1)
    edges = rng.integers(0, 300, size=(2, 160)).astype(np.int32)

    def scores(fused):
        net = Net(input_dim=NS + 1, hidden_dim=16, dropout=0.0,
                  fused_hidden=fused)
        tr = trainer_from_keys(net, spgk, cfg)
        params, _ = tr.init(jax.random.PRNGKey(0), edges[:, :64])
        bucket = spgk.nodes.shape[1]
        classes = (8, 16, max(32, bucket))
        return (np.asarray(tr.predict(params, edges)),
                np.asarray(tr.predict_balanced(params, edges, classes)))

    plain0, bal0 = scores(False)
    plain1, bal1 = scores(True)
    np.testing.assert_allclose(bal0, plain0, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(plain1, plain0, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(bal1, plain0, rtol=1e-5, atol=1e-6)


def test_lstm_kernel_grads_match_scan():
    """In-kernel chunked BPTT == XLA scan gradients (dx, dwi, dwh, dbh)."""
    from surel_plus_tpu.models.layers import LSTMAggregation
    from surel_plus_tpu.ops.pallas.lstm_kernel import lstm_final_hidden

    rng = np.random.default_rng(8)
    B, L, h, H = 9, 23, 6, 8
    x = jnp.asarray(rng.normal(size=(B, L, h)).astype(np.float32))
    sizes = rng.integers(1, L + 1, size=B)
    mask = jnp.asarray(np.arange(L)[None, :] < sizes[:, None])
    g = jnp.asarray(rng.normal(size=(B, H)).astype(np.float32))

    agg = LSTMAggregation(H, chunk=5)
    params = agg.init(jax.random.PRNGKey(0), x, mask)
    p = params["params"]

    def loss_ref(x, wi, wh, bh):
        pp = {"params": {"wi": wi, "wh": wh, "bh": bh}}
        return (agg.apply(pp, x, mask) * g).sum()

    def loss_ker(x, wi, wh, bh):
        # chunk=4 does not divide L=23: exercises the wrapper's padding
        return (lstm_final_hidden(x, mask, wi, wh, bh, chunk=4,
                                  interpret=True) * g).sum()

    g0 = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(
        x, p["wi"], p["wh"], p["bh"])
    g1 = jax.grad(loss_ker, argnums=(0, 1, 2, 3))(
        x, p["wi"], p["wh"], p["bh"])
    for name, a, b in zip(("dx", "dwi", "dwh", "dbh"), g0, g1):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-4, atol=1e-5, err_msg=name)


def test_attn_inference_pool_kernel_matches_unfused():
    """Fully fused attention inference (keys -> pooled, one Pallas pass)
    matches the unfused XLA attention path."""
    g = rmat_graph(200, 1000, seed=11)
    spgk = sample_gsets_device_keys(
        g, np.arange(200, dtype=np.int32), num_walks=NW, num_steps=NS,
        seed=2, block_size=64)
    rng = np.random.default_rng(12)
    edges = jnp.asarray(rng.integers(0, 200, size=(2, 20)).astype(np.int32))
    joined = make_keys_join(NW, NS)(spgk.nodes, spgk.khi, spgk.klo,
                                    spgk.sizes, edges)

    kw = dict(input_dim=NS + 1, hidden_dim=16, aggrs="attn",
              dropout=0.0, dtype="float32", key_layout=(NW, NS))
    m0 = Net(fused_hidden=False, **kw)
    m1 = Net(fused_hidden=True, **kw)
    enc = jnp.zeros((1, 1), jnp.float32)
    p = m0.init(jax.random.PRNGKey(0), enc, joined)
    l0 = m0.apply(p, enc, joined)          # train=False -> pool kernel
    l1 = m1.apply(p, enc, joined)
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l0),
                               rtol=1e-5, atol=1e-5)


def test_lead_in_hi_layout_fused_matches_unfused():
    """The S=4, M=200 layout (ppa/tags-math) fills the lo word exactly
    and keeps the root bit in hi: the join derives root PLANES from node
    ids and every fused path (mean train+grads, attn, lstm, HONet)
    matches the XLA reference."""
    from surel_plus_tpu.models import HONet
    from surel_plus_tpu.ops.join import make_keys_hjoin
    from surel_plus_tpu.ops.walk import enc_field_layout

    NW2, NS2 = 200, 4
    assert enc_field_layout(NW2, NS2)[2] == 32   # truly lead-in-hi
    g = rmat_graph(150, 700, seed=13)
    spgk = sample_gsets_device_keys(
        g, np.arange(150, dtype=np.int32), num_walks=NW2, num_steps=NS2,
        seed=2, block_size=64)
    rng = np.random.default_rng(14)
    edges = jnp.asarray(rng.integers(0, 150, size=(2, 12)).astype(np.int32))
    joined = make_keys_join(NW2, NS2)(spgk.nodes, spgk.khi, spgk.klo,
                                      spgk.sizes, edges)
    assert joined.kown_root is not None
    enc = jnp.zeros((1, 1), jnp.float32)

    for aggrs in ("mean", "attn", "lstm"):
        kw = dict(input_dim=NS2 + 1, hidden_dim=16, aggrs=aggrs,
                  dropout=0.0, dtype="float32", key_layout=(NW2, NS2))
        m0 = Net(fused_hidden=False, **kw)
        m1 = Net(fused_hidden=True, **kw)
        p = m0.init(jax.random.PRNGKey(0), enc, joined)
        l0 = m0.apply(p, enc, joined)
        l1 = m1.apply(p, enc, joined)
        np.testing.assert_allclose(np.asarray(l1), np.asarray(l0),
                                   rtol=1e-5, atol=1e-5, err_msg=aggrs)
    # gradients through the mean set-sum kernel with root planes
    kwm = dict(input_dim=NS2 + 1, hidden_dim=16, aggrs="mean",
               dropout=0.0, dtype="float32", key_layout=(NW2, NS2))
    m0 = Net(fused_hidden=False, **kwm)
    m1 = Net(fused_hidden=True, **kwm)
    p = m0.init(jax.random.PRNGKey(0), enc, joined)
    g0 = jax.grad(lambda q: (m0.apply(q, enc, joined) ** 2).sum())(p)
    g1 = jax.grad(lambda q: (m1.apply(q, enc, joined) ** 2).sum())(p)
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-4, atol=1e-5)

    # gradients through the keys-LSTM kernel with root planes: the
    # transposed-layout backward's lead-in-hi root handling is
    # otherwise untested (forward-only above; the grad parity test in
    # test_net_fused_slots uses a lead-in-lo join whose roots are None)
    kwl = dict(input_dim=NS2 + 1, hidden_dim=16, aggrs="lstm",
               dropout=0.0, dtype="float32", key_layout=(NW2, NS2))
    m0 = Net(fused_hidden=False, **kwl)
    m1 = Net(fused_hidden=True, **kwl)
    p = m0.init(jax.random.PRNGKey(0), enc, joined)
    rngs = {"dropout": jax.random.PRNGKey(1)}

    def lloss(q, m):
        out = m.apply(q, enc, joined, None, train=True, rngs=rngs)
        return (out ** 2).sum()

    g0 = jax.grad(lloss)(p, m0)
    g1 = jax.grad(lloss)(p, m1)
    for (k, a), (_, b) in zip(jax.tree_util.tree_leaves_with_path(g0),
                              jax.tree_util.tree_leaves_with_path(g1)):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=1e-4, atol=1e-4,
            err_msg="lstm-root " + jax.tree_util.keystr(k))

    # HONet over hyperedges with the same layout
    hedges = jnp.asarray(rng.integers(0, 150, size=(3, 8)).astype(np.int32))
    hj = make_keys_hjoin(NW2, NS2)(spgk.nodes, spgk.khi, spgk.klo,
                                   spgk.sizes, hedges)
    assert hj.kown_root is not None
    h0 = HONet(input_dim=NS2 + 1, hidden_dim=16, fused_hidden=False,
               key_layout=(NW2, NS2))
    h1 = HONet(input_dim=NS2 + 1, hidden_dim=16, fused_hidden=True,
               key_layout=(NW2, NS2))
    ph = h0.init(jax.random.PRNGKey(0), enc, hj)
    np.testing.assert_allclose(
        np.asarray(h1.apply(ph, enc, hj)),
        np.asarray(h0.apply(ph, enc, hj)), rtol=1e-5, atol=1e-5)


def test_attn_pool_kernel_grads_match_unfused():
    """Attention training through the fused pool kernel (custom VJP):
    parameter gradients match the unfused XLA path."""
    g = rmat_graph(200, 1000, seed=15)
    spgk = sample_gsets_device_keys(
        g, np.arange(200, dtype=np.int32), num_walks=NW, num_steps=NS,
        seed=2, block_size=64)
    rng = np.random.default_rng(16)
    edges = jnp.asarray(rng.integers(0, 200, size=(2, 16)).astype(np.int32))
    joined = make_keys_join(NW, NS)(spgk.nodes, spgk.khi, spgk.klo,
                                    spgk.sizes, edges)

    kw = dict(input_dim=NS + 1, hidden_dim=16, aggrs="attn",
              dropout=0.0, dtype="float32", key_layout=(NW, NS))
    m0 = Net(fused_hidden=False, **kw)
    m1 = Net(fused_hidden=True, **kw)
    enc = jnp.zeros((1, 1), jnp.float32)
    p = m0.init(jax.random.PRNGKey(0), enc, joined)
    rngs = {"dropout": jax.random.PRNGKey(1)}

    def loss(q, m):
        out = m.apply(q, enc, joined, None, train=True, rngs=rngs)
        return (out ** 2).sum()

    g0 = jax.grad(loss)(p, m0)
    g1 = jax.grad(loss)(p, m1)
    for (k, a), (_, b) in zip(jax.tree_util.tree_leaves_with_path(g0),
                              jax.tree_util.tree_leaves_with_path(g1)):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=1e-4, atol=1e-5,
            err_msg=jax.tree_util.keystr(k))


def test_fused_kernels_odd_shapes():
    """Raw wrappers at unaligned B/L exercise every padding path."""
    from surel_plus_tpu.models.layers import LSTMAggregation
    from surel_plus_tpu.ops.pallas.hidden_sum_kernel import (
        fused_attn_pool, fused_key_hidden_slots)
    from surel_plus_tpu.ops.pallas.lstm_kernel import lstm_from_keys

    rng = np.random.default_rng(17)
    Q, B, L, H = 2, 5, 11, 8
    kown = jnp.asarray(_rand_keys(rng, (Q, B, L)))
    kc = jnp.asarray(_rand_keys(rng, (Q, B, L)))
    sizes = rng.integers(1, L + 1, size=(Q, B))
    mask = jnp.asarray(np.arange(L)[None, None, :] < sizes[..., None])
    w1 = jnp.asarray(rng.normal(size=(NS + 1, H)).astype(np.float32))
    b1 = jnp.asarray(rng.normal(size=(H,)).astype(np.float32))
    u_ext = _u_ext(w1, b1)

    # per-slot rows vs direct reference
    hs = fused_key_hidden_slots(kown, kc, u_ext, SHIFT, interpret=True)
    want = (_hid(kown, w1, b1) + _hid(kc, w1, b1))
    np.testing.assert_allclose(np.asarray(hs), np.asarray(want),
                               rtol=1e-5, atol=1e-5)

    # attention pool vs folded XLA attention on the same rows
    gvec = jnp.asarray(rng.normal(size=(H, 1)).astype(np.float32))
    gconst = jnp.asarray([[0.3]], dtype=jnp.float32)
    pooled = fused_attn_pool(kown, kc, mask, u_ext, gvec, gconst,
                             SHIFT, interpret=True)
    gate = jnp.where(mask[..., None], want @ gvec + gconst, -jnp.inf)
    a = jnp.where(mask[..., None], jax.nn.softmax(gate, axis=-2), 0.0)
    np.testing.assert_allclose(np.asarray(pooled),
                               np.asarray((a * want).sum(-2)),
                               rtol=1e-5, atol=1e-5)

    # keys-LSTM vs scan over the same rows (chunk not dividing L)
    agg = LSTMAggregation(H, chunk=4)
    x = want.reshape(Q * B, L, H)
    mf = mask.reshape(Q * B, L)
    params = agg.init(jax.random.PRNGKey(0), x, mf)
    ref = agg.apply(params, x, mf)
    p = params["params"]
    got = lstm_from_keys(kown, kc, mask, u_ext, p["wi"], p["wh"],
                         p["bh"], SHIFT, chunk=4, interpret=True)
    np.testing.assert_allclose(np.asarray(got).reshape(Q * B, H),
                               np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_fused_fits_vmem_gate():
    """The scoped-VMEM predicate separates the two hardware-calibrated
    M=200 observations (q=4 OOMs at a measured 18.04 MB, q=2 runs) and
    accepts every published link config; Net/HONet fall back to the XLA
    path when it returns False, so a False here must still produce
    correct scores through the unfused branch (covered by the parity
    tests above — this pins the gate itself)."""
    from surel_plus_tpu.ops.pallas.hidden_sum_kernel import fused_fits

    # published link configs (q=2, cross plane = 2L): all fused
    assert fused_fits(301, 602, 96)          # M=100 S'=3 (collab etc.)
    assert fused_fits(801, 1602, 96)         # M=200 S'=4 (ppa) — ran
    # slot-aligned cross (attn/per-slot paths): also fused at M=200
    assert fused_fits(801, 801, 96)
    # HONet's four groups at M=200: measured 18.04 MB scoped OOM on
    # v5e — must gate off
    assert not fused_fits(801, 1602, 96, q=4)
    # but HONet at the M=100 shapes stays fused
    assert fused_fits(301, 602, 96, q=4)
    # attn pool weights (backward keeps ~7 slot-aligned planes alive):
    # link shapes fused, M=200 gates off (measured 22.51 MB OOM)
    assert fused_fits(301, 301, 96, w_own=3.5, w_cross=3.5)
    assert not fused_fits(801, 801, 96, w_own=3.5, w_cross=3.5)


def test_chunked_and_split_gates_at_wide_shapes():
    """The r4 wide-shape routes: at ppa's M=200 layout the attn pool
    picks a slot chunk and the q=4 hyperedge set-sum picks a split
    count — the fused path no longer gates off anywhere (VERDICT r3
    items 3+4). Each slice/part must itself pass the calibrated
    estimate."""
    from surel_plus_tpu.ops.pallas.hidden_sum_kernel import (
        attn_pool_chunk, fused_fits, set_sum_splits)

    # link shapes stay monolithic
    assert attn_pool_chunk(301, 301, 96) is None
    assert set_sum_splits(301, 602, 96) == 1
    assert set_sum_splits(301, 602, 96, q=4) == 1
    # ppa M=200: attn chunks, each slice fits the backward estimate
    chunk = attn_pool_chunk(801, 801, 96)
    assert chunk is not None
    assert fused_fits(chunk, chunk, 96, w_own=3.5, w_cross=3.5)
    # tags-math M=200 q=4: the set-sum splits, each part fits
    ns = set_sum_splits(801, 1602, 96, q=4)
    assert ns > 1
    assert fused_fits(-(-801 // ns), -(-1602 // ns), 96, q=4)


def test_chunked_attn_matches_monolithic_and_unfused(monkeypatch):
    """Force the chunked attn kernels at a small shape by shrinking the
    VMEM budget: logits and parameter gradients must match both the
    monolithic kernel and the unfused XLA path (same join, same
    params)."""
    g = rmat_graph(200, 1000, seed=15)
    spgk = sample_gsets_device_keys(
        g, np.arange(200, dtype=np.int32), num_walks=NW, num_steps=NS,
        seed=2, block_size=64)
    rng = np.random.default_rng(16)
    edges = jnp.asarray(rng.integers(0, 200, size=(2, 16)).astype(np.int32))
    joined = make_keys_join(NW, NS)(spgk.nodes, spgk.khi, spgk.klo,
                                    spgk.sizes, edges)

    kw = dict(input_dim=NS + 1, hidden_dim=16, aggrs="attn",
              dropout=0.0, dtype="float32", key_layout=(NW, NS))
    m0 = Net(fused_hidden=False, **kw)
    m1 = Net(fused_hidden=True, **kw)
    enc = jnp.zeros((1, 1), jnp.float32)
    p = m0.init(jax.random.PRNGKey(0), enc, joined)
    rngs = {"dropout": jax.random.PRNGKey(1)}

    def loss(q, m):
        out = m.apply(q, enc, joined, None, train=True, rngs=rngs)
        return (out ** 2).sum()

    l0 = m0.apply(p, enc, joined)
    g0 = jax.grad(loss)(p, m0)
    l_mono = m1.apply(p, enc, joined)
    g_mono = jax.grad(loss)(p, m1)

    from surel_plus_tpu.ops.pallas.hidden_sum_kernel import (
        attn_pool_chunk)
    monkeypatch.setenv("SUREL_HSUM_VMEM_BUDGET", str(64 * 1024))
    assert attn_pool_chunk(joined.kown.shape[-1],
                           joined.kcross_al.shape[-1], 16) is not None
    l_ck = m1.apply(p, enc, joined)
    g_ck = jax.grad(loss)(p, m1)

    np.testing.assert_allclose(np.asarray(l_mono), np.asarray(l0),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(l_ck), np.asarray(l0),
                               rtol=1e-5, atol=1e-5)
    for (k, a), (_, b), (_, c) in zip(
            jax.tree_util.tree_leaves_with_path(g0),
            jax.tree_util.tree_leaves_with_path(g_mono),
            jax.tree_util.tree_leaves_with_path(g_ck)):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=1e-4, atol=1e-5,
            err_msg="mono " + jax.tree_util.keystr(k))
        np.testing.assert_allclose(
            np.asarray(c), np.asarray(a), rtol=1e-4, atol=1e-5,
            err_msg="chunked " + jax.tree_util.keystr(k))


def test_split_set_sum_matches_monolithic_and_unfused(monkeypatch):
    """Force slot-range splitting of the mean set-sum (Net) and the
    q=4 hyperedge set-sum (HONet) via a tiny VMEM budget: logits and
    gradients must match the unfused XLA path."""
    from surel_plus_tpu.models import HONet
    from surel_plus_tpu.ops.join import make_keys_hjoin
    from surel_plus_tpu.ops.pallas.hidden_sum_kernel import (
        set_sum_splits)

    g = rmat_graph(150, 700, seed=23)
    spgk = sample_gsets_device_keys(
        g, np.arange(150, dtype=np.int32), num_walks=NW, num_steps=NS,
        seed=2, block_size=64)
    rng = np.random.default_rng(24)
    edges = jnp.asarray(rng.integers(0, 150, size=(2, 12)).astype(np.int32))
    joined = make_keys_join(NW, NS)(spgk.nodes, spgk.khi, spgk.klo,
                                    spgk.sizes, edges)
    enc = jnp.zeros((1, 1), jnp.float32)

    kw = dict(input_dim=NS + 1, hidden_dim=16, aggrs="mean",
              dropout=0.0, dtype="float32", key_layout=(NW, NS))
    m0 = Net(fused_hidden=False, **kw)
    m1 = Net(fused_hidden=True, **kw)
    p = m0.init(jax.random.PRNGKey(0), enc, joined)
    l0 = m0.apply(p, enc, joined)
    g0 = jax.grad(lambda q: (m0.apply(q, enc, joined) ** 2).sum())(p)

    monkeypatch.setenv("SUREL_HSUM_VMEM_BUDGET", str(64 * 1024))
    assert set_sum_splits(joined.kown.shape[-1],
                          joined.kcross.shape[-1], 16) > 1
    l1 = m1.apply(p, enc, joined)
    g1 = jax.grad(lambda q: (m1.apply(q, enc, joined) ** 2).sum())(p)
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l0),
                               rtol=1e-5, atol=1e-5)
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-4, atol=1e-5)

    # HONet q=4 under the same forced split
    hedges = jnp.asarray(rng.integers(0, 150, size=(3, 8)).astype(np.int32))
    hj = make_keys_hjoin(NW, NS)(spgk.nodes, spgk.khi, spgk.klo,
                                 spgk.sizes, hedges)
    h0 = HONet(input_dim=NS + 1, hidden_dim=16, fused_hidden=False,
               key_layout=(NW, NS))
    h1 = HONet(input_dim=NS + 1, hidden_dim=16, fused_hidden=True,
               key_layout=(NW, NS))
    ph = h0.init(jax.random.PRNGKey(0), enc, hj)
    hl0 = h0.apply(ph, enc, hj)
    hg0 = jax.grad(lambda q: (h0.apply(q, enc, hj) ** 2).sum())(ph)
    hl1 = h1.apply(ph, enc, hj)
    hg1 = jax.grad(lambda q: (h1.apply(q, enc, hj) ** 2).sum())(ph)
    np.testing.assert_allclose(np.asarray(hl1), np.asarray(hl0),
                               rtol=1e-5, atol=1e-5)
    for a, b in zip(jax.tree.leaves(hg0), jax.tree.leaves(hg1)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-4, atol=1e-5)


def test_chunked_attn_lead_in_hi_roots(monkeypatch):
    """Chunked attn with root PLANES (lead-in-hi layout): forward and
    gradients match the unfused path — the root planes must slice along
    the slot axis exactly like the key planes."""
    from surel_plus_tpu.ops.walk import enc_field_layout

    NW2, NS2 = 200, 4
    assert enc_field_layout(NW2, NS2)[2] == 32
    g = rmat_graph(150, 700, seed=13)
    spgk = sample_gsets_device_keys(
        g, np.arange(150, dtype=np.int32), num_walks=NW2, num_steps=NS2,
        seed=2, block_size=64)
    rng = np.random.default_rng(14)
    edges = jnp.asarray(rng.integers(0, 150, size=(2, 12)).astype(np.int32))
    joined = make_keys_join(NW2, NS2)(spgk.nodes, spgk.khi, spgk.klo,
                                      spgk.sizes, edges)
    assert joined.kown_root is not None
    enc = jnp.zeros((1, 1), jnp.float32)
    kw = dict(input_dim=NS2 + 1, hidden_dim=16, aggrs="attn",
              dropout=0.0, dtype="float32", key_layout=(NW2, NS2))
    m0 = Net(fused_hidden=False, **kw)
    m1 = Net(fused_hidden=True, **kw)
    p = m0.init(jax.random.PRNGKey(0), enc, joined)
    rngs = {"dropout": jax.random.PRNGKey(1)}

    def loss(q, m):
        out = m.apply(q, enc, joined, None, train=True, rngs=rngs)
        return (out ** 2).sum()

    l0 = m0.apply(p, enc, joined)
    g0 = jax.grad(loss)(p, m0)
    monkeypatch.setenv("SUREL_HSUM_VMEM_BUDGET", str(64 * 1024))
    l1 = m1.apply(p, enc, joined)
    g1 = jax.grad(loss)(p, m1)
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l0),
                               rtol=1e-5, atol=1e-5)
    for (k, a), (_, b) in zip(jax.tree_util.tree_leaves_with_path(g0),
                              jax.tree_util.tree_leaves_with_path(g1)):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=1e-4, atol=1e-5,
            err_msg=jax.tree_util.keystr(k))


def test_honet_group_split_matches_unfused(monkeypatch):
    """HONet's q=4 fused path splits along the GROUP axis into two q=2
    calls (the hjoin cross plane is two merges side by side, each group
    pair reading only its half — join_gathered_hkeys); logits and grads
    must match the unfused template, including when a tiny forced VMEM
    budget makes each q=2 part slot-split further."""
    from surel_plus_tpu.graph.synthetic import rmat_graph
    from surel_plus_tpu.models import HONet
    from surel_plus_tpu.ops.join import make_keys_hjoin
    from surel_plus_tpu.ops.sampler import sample_gsets_device_keys

    NW, NS = 8, 3
    g = rmat_graph(300, 2400, seed=4)
    spgk = sample_gsets_device_keys(
        g, np.arange(300, dtype=np.int32), num_walks=NW, num_steps=NS,
        seed=4, block_size=300)
    rng = np.random.default_rng(11)
    he = jnp.asarray(rng.integers(0, 300, size=(3, 24)).astype(np.int32))
    joined = make_keys_hjoin(NW, NS)(spgk.nodes, spgk.khi, spgk.klo,
                                     spgk.sizes, he)
    assert joined.kown is not None
    enc = jnp.zeros((1, 1), jnp.float32)
    kw = dict(input_dim=NS, hidden_dim=16, dropout=0.0)
    m0 = HONet(fused_hidden=False, **kw)
    m1 = HONet(fused_hidden=True, key_layout=(NW, NS), **kw)
    p = m0.init(jax.random.PRNGKey(0), enc, joined)

    def loss(q, m):
        return (m.apply(q, enc, joined) ** 2).sum()

    l0 = m0.apply(p, enc, joined)
    g0 = jax.grad(loss)(p, m0)
    for budget in (None, 48 * 1024):   # monolithic parts, then forced split
        if budget is not None:
            monkeypatch.setenv("SUREL_HSUM_VMEM_BUDGET", str(budget))
        l1 = m1.apply(p, enc, joined)
        g1 = jax.grad(loss)(p, m1)
        np.testing.assert_allclose(np.asarray(l1), np.asarray(l0),
                                   rtol=1e-5, atol=1e-5)
        for (k, a), (_, b) in zip(
                jax.tree_util.tree_leaves_with_path(g0),
                jax.tree_util.tree_leaves_with_path(g1)):
            np.testing.assert_allclose(
                np.asarray(b), np.asarray(a), rtol=1e-4, atol=1e-5,
                err_msg=f"budget={budget} {jax.tree_util.keystr(k)}")


def test_lstm_tile_policy():
    """Pin the keys-LSTM auto tile policy (hardware-calibrated r4:
    wide forward tiles amortize the latency-bound recurrence; the
    backward tile is VMEM-capped by its chunk scratch, and the
    lead-in-hi root layout's 5 double-buffered planes shrink the
    forward tile at M=200)."""
    from surel_plus_tpu.ops.pallas.lstm_kernel import _pick_tiles

    # bench shape [2, 4096, 301], lead-in-lo (no roots): 512/256
    tb, tbb, chunk, ellp = _pick_tiles(8192, 301, 97, 96, 6, False)
    assert (tb, tbb) == (512, 256)
    assert ellp % chunk == 0 and ellp >= 301
    # M=200 lead-in-hi (root planes): fwd shrinks to 256, bwd to 128
    tb, tbb, _, _ = _pick_tiles(8192, 801, 97, 96, 6, True)
    assert (tb, tbb) == (256, 128)
    # sub-128 rows: whole-array tiles
    tb, tbb, _, _ = _pick_tiles(48, 37, 17, 16, 5, False)
    assert tb == 48 and tbb == 48
    # explicit caller tiles are honored at multiples of 128
    tb, tbb, _, _ = _pick_tiles(8192, 301, 97, 96, 6, False,
                                tb=128, tb_bwd=128)
    assert (tb, tbb) == (128, 128)
