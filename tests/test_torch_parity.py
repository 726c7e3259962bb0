"""Golden model-parity tests: the flax Net must match a torch replica of
the reference equations (model.py:45-104) bit-for-bit in architecture —
same weights => same outputs.

The replica re-states the reference math (pe_embedding -> pair sum ->
set aggregation -> MergeLayer) with plain torch ops (no PyG dependency);
weights are copied from the flax parameter tree (flax kernels are
[in, out]; torch weights are [out, in])."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from surel_plus_tpu.models import Net
from surel_plus_tpu.ops.join import JoinedBatch

B, L, S, U, H = 5, 9, 4, 13, 16


def _setup(aggrs):
    rng = np.random.default_rng(0)
    enc = rng.random((U + 1, S)).astype(np.float32)
    enc[0] = 0
    eidx = rng.integers(0, U + 1, size=(2, B, L, 2)).astype(np.int32)
    sizes = rng.integers(1, L + 1, size=(2, B)).astype(np.int32)
    mask = np.arange(L)[None, None, :] < sizes[:, :, None]
    eidx = np.where(mask[..., None], eidx, 0)
    joined = JoinedBatch(eidx=jnp.asarray(eidx), mask=jnp.asarray(mask),
                         sizes=jnp.asarray(sizes))
    net = Net(input_dim=S, hidden_dim=H, aggrs=aggrs, dropout=0.0)
    params = net.init(jax.random.PRNGKey(0), jnp.asarray(enc), joined)
    out = net.apply(params, jnp.asarray(enc), joined)
    return enc, eidx, mask, params, np.asarray(out)


def _lin(p):
    """flax Dense params -> torch Linear."""
    w = torch.tensor(np.asarray(p["kernel"]).T)
    b = torch.tensor(np.asarray(p["bias"]))
    lin = torch.nn.Linear(w.shape[1], w.shape[0])
    with torch.no_grad():
        lin.weight.copy_(w)
        lin.bias.copy_(b)
    return lin


def _torch_pe(params, feats):
    pe = params["params"]["pe_embedding"]
    l1, l2 = _lin(pe["Dense_0"]), _lin(pe["Dense_1"])
    return l2(torch.relu(l1(feats)))


def _torch_merge(params, xl, xr):
    m = params["params"]["affinity_score"]
    l1, l2 = _lin(m["Dense_0"]), _lin(m["Dense_1"])
    h = torch.relu(l1(torch.cat([xl, xr], dim=-1)))
    return l2(h).squeeze(-1)


@pytest.mark.parametrize("aggrs", ["mean", "attn"])
def test_net_matches_torch_replica(aggrs):
    enc, eidx, mask, params, want = _setup(aggrs)

    feats = torch.tensor(enc[eidx])            # [2, B, L, 2, S]
    x = _torch_pe(params, feats).sum(dim=-2)   # [2, B, L, H] pair-sum
    m = torch.tensor(mask)[..., None].float()

    if aggrs == "mean":
        agg = (x * m).sum(dim=-2) / m.sum(dim=-2).clamp(min=1.0)
    else:  # attention: PyG AttentionalAggregation semantics
        a = params["params"]["aggr"]
        gate = _lin(a["Dense_0"])(x)           # [2, B, L, 1]
        gate = gate.masked_fill(~torch.tensor(mask)[..., None],
                                float("-inf"))
        attn = torch.softmax(gate, dim=-2)
        val = _lin(a["Dense_1"])(x)
        agg = (attn * val).sum(dim=-2)

    got = _torch_merge(params, agg[0], agg[1]).detach().numpy()
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=1e-5)


def test_honet_matches_torch_replica():
    from surel_plus_tpu.models import HONet

    rng = np.random.default_rng(1)
    enc = rng.random((U + 1, S)).astype(np.float32)
    enc[0] = 0
    eidx = rng.integers(0, U + 1, size=(4, B, L, 2)).astype(np.int32)
    sizes = rng.integers(1, L + 1, size=(4, B)).astype(np.int32)
    mask = np.arange(L)[None, None, :] < sizes[:, :, None]
    eidx = np.where(mask[..., None], eidx, 0)
    joined = JoinedBatch(eidx=jnp.asarray(eidx), mask=jnp.asarray(mask),
                         sizes=jnp.asarray(sizes))
    net = HONet(input_dim=S, hidden_dim=H, dropout=0.0)
    params = net.init(jax.random.PRNGKey(0), jnp.asarray(enc), joined)
    want = np.asarray(net.apply(params, jnp.asarray(enc), joined))

    feats = torch.tensor(enc[eidx])
    x = _torch_pe(params, feats).sum(dim=-2)
    m = torch.tensor(mask)[..., None].float()
    agg = (x * m).sum(dim=-2) / m.sum(dim=-2).clamp(min=1.0)  # scatter_mean
    mm = params["params"]["affinity_score"]
    l1, l2 = _lin(mm["Dense_0"]), _lin(mm["Dense_1"])
    h = torch.relu(l1(torch.cat([agg[0], agg[1], agg[2], agg[3]], dim=-1)))
    got = l2(h).squeeze(-1).detach().numpy()
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=1e-5)


def test_net_lstm_matches_torch_replica():
    """LSTM aggregation == torch nn.LSTM over each set's valid prefix,
    final hidden state (PyG LSTMAggregation semantics, model.py:63-65).

    The fused-projection layout stores wi [h, 4H], wh [H, 4H], bh [4H]
    with (i, f, g, o) gate chunks — torch's stacking — so
    weight_ih = wi.T, weight_hh = wh.T, bias_hh = bh, bias_ih = 0."""
    enc, eidx, mask, params, want = _setup("lstm")

    feats = torch.tensor(enc[eidx])            # [2, B, L, 2, S]
    x = _torch_pe(params, feats).sum(dim=-2)   # [2, B, L, H]

    a = params["params"]["aggr"]
    H_ = np.asarray(a["wh"]).shape[0]
    w_ih = torch.tensor(np.asarray(a["wi"]).T)   # [4H, h], (i,f,g,o) rows
    w_hh = torch.tensor(np.asarray(a["wh"]).T)
    b_hh = torch.tensor(np.asarray(a["bh"]))
    lstm = torch.nn.LSTM(x.shape[-1], H_, batch_first=True)
    with torch.no_grad():
        lstm.weight_ih_l0.copy_(w_ih)
        lstm.weight_hh_l0.copy_(w_hh)
        lstm.bias_ih_l0.zero_()
        lstm.bias_hh_l0.copy_(b_hh)

    sizes = torch.tensor(mask.sum(axis=-1))    # [2, B]
    flat = x.reshape(-1, x.shape[-2], x.shape[-1])
    out, _ = lstm(flat)                        # [2B, L, H]
    last = out[torch.arange(flat.shape[0]), sizes.reshape(-1) - 1]
    agg = last.reshape(2, -1, H_)

    got = _torch_merge(params, agg[0], agg[1]).detach().numpy()
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=1e-5)
