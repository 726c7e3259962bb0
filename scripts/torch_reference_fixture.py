"""Reference-semantics torch head-to-head on the committed fixture.

Re-states the reference's CPU/torch training pipeline (train.py:13-45,
114-172,175-245 and model.py:6-104) on the SAME data our CLI consumes:
identical fixture splits, identical masking/negatives (same
LinkPropDataset + seed discipline as cli/main.py), identical SpG samples
(subg_matrix with the same seed), exported to the reference's scipy-CSR
+ encoding-table layout (spg.to_scipy). Training then runs the
reference's exact semantics: scipy masked-add gather, torch Net
(pe_embedding -> pair-sum -> mean / gated-attention / LSTM aggregation
by indptr segments, --aggrs selects, model.py:59-67 -> MergeLayer),
BCEWithLogitsLoss + Adam, grad-clip placed BEFORE backward exactly as
the reference has it (train.py:131-133 — a stale-gradient clip; kept
for semantic fidelity), OGB-strict Hits@K, and the same
best-valid/early-stop selection (utils/logger.ResultLogger).

Purpose (VERDICT r2, next-round item 2): with OGB downloads blocked,
this converts "the pipeline runs" into "the pipeline's ACCURACY matches
the reference" — the two sides differ only in framework (torch+scipy vs
jax/TPU), so matching Hits@K within run-to-run std is direct evidence
of accuracy-semantics parity.

Usage (CPU, ~minutes on the small fixture):
  python scripts/torch_reference_fixture.py --dataset fixture-collab \
      --num_walks 200 --num_steps 3 --k 10 --epochs 30 --eval_steps 2 \
      --early_stop 5 --runs 3 --batch_size 4096
"""

from __future__ import annotations

import argparse
import logging
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")  # sampling runs on CPU jax

import torch

from surel_plus_tpu.graph.datasets import LinkPropDataset
from surel_plus_tpu.graph.splits import get_pos_neg_edges
from surel_plus_tpu.ops import metrics as metrics_ops
from surel_plus_tpu.ops.sampler import subg_matrix
from surel_plus_tpu.utils.config import (
    ExperimentConfig, add_config_args, apply_dataset_overrides,
    config_from_args)
from surel_plus_tpu.utils.logger import ResultLogger
from surel_plus_tpu.utils.seeding import set_random_seed

log = logging.getLogger("torch_ref")


# ---------------------------------------------------------------------------
# Reference Net re-statement (model.py:45-104), mean aggregation (ptr path)

class MergeLayer(torch.nn.Module):
    """model.py:6-27 (non_linear branch): cat -> fc1 -> relu -> dropout
    -> fc2, xavier_normal_ weights."""

    def __init__(self, dim_in: int, hidden: int, dropout: float):
        super().__init__()
        self.fc1 = torch.nn.Linear(dim_in, hidden)
        self.fc2 = torch.nn.Linear(hidden, 1)
        self.dropout = dropout
        self.reset_parameters()

    def reset_parameters(self):
        self.fc1.reset_parameters()
        self.fc2.reset_parameters()
        torch.nn.init.xavier_normal_(self.fc1.weight)
        torch.nn.init.xavier_normal_(self.fc2.weight)

    def forward(self, x1, x2):
        h = torch.relu(self.fc1(torch.cat([x1, x2], dim=-1)))
        h = torch.nn.functional.dropout(h, p=self.dropout,
                                        training=self.training)
        return self.fc2(h).squeeze(-1)


class AttnAggregation(torch.nn.Module):
    """PyG-free re-statement of aggr.AttentionalAggregation(
    gate_nn=MLP([h, 1]), nn=MLP([h, h])) exactly as model.py:59-62
    builds it (a single-layer PyG MLP is one Linear — norms/acts apply
    only between layers): scalar gate per element, segment softmax,
    weighted sum of the value-transformed features."""

    def __init__(self, hidden_dim: int):
        super().__init__()
        self.gate_nn = torch.nn.Linear(hidden_dim, 1)
        self.value_nn = torch.nn.Linear(hidden_dim, hidden_dim)

    def reset_parameters(self):
        for lin in (self.gate_nn, self.value_nn):
            lin.reset_parameters()
            torch.nn.init.xavier_normal_(lin.weight)

    def forward(self, x, seg, nseg):
        gate = self.gate_nn(x)                          # [rows, 1]
        gate = gate - gate.max()                        # global shift
        e = torch.exp(gate)
        denom = torch.zeros(nseg, 1, dtype=x.dtype)
        denom.index_add_(0, seg, e)
        a = e / denom[seg]
        val = self.value_nn(x)
        out = torch.zeros(nseg, x.shape[-1], dtype=x.dtype)
        out.index_add_(0, seg, a * val)
        return out

    def forward_dedup(self, h_u, inv, seg, nseg):
        """Same math with the gate/value Linears applied once per UNIQUE
        feature row (h_u) and gathered back via inv — the per-row exp /
        softmax / weighted index_add are unchanged. See
        TorchNet.forward's dedup note."""
        gate_u = self.gate_nn(h_u)                      # [U, 1]
        val_u = self.value_nn(h_u)                      # [U, H]
        gate = gate_u[inv]
        gate = gate - gate.max()
        e = torch.exp(gate)
        denom = torch.zeros(nseg, 1, dtype=h_u.dtype)
        denom.index_add_(0, seg, e)
        a = e / denom[seg]
        out = torch.zeros(nseg, h_u.shape[-1], dtype=h_u.dtype)
        out.index_add_(0, seg, a * val_u[inv])
        return out


class LSTMAggregation(torch.nn.Module):
    """PyG-free re-statement of aggr.LSTMAggregation (model.py:63-65):
    torch nn.LSTM over each segment in CSR column (node-id) order,
    final hidden state as the set embedding.

    Default semantics: final hidden AT THE LAST VALID element
    (pack_padded_sequence), matching this framework's masked-scan
    aggregator (models/layers.py). PyG 2.2's actual implementation runs
    the recurrence over trailing zero-padding and takes the last PADDED
    timestep (`lstm(x)[0][:, -1]`) — a batch-composition-dependent
    artifact, since the padding length depends on the longest set in
    the gathered batch. Set SUREL_LSTM_PAD_QUIRK=1 to reproduce that
    quirk verbatim for an apples-to-PyG comparison."""

    def __init__(self, hidden_dim: int):
        super().__init__()
        self.lstm = torch.nn.LSTM(hidden_dim, hidden_dim,
                                  batch_first=True)
        self.pad_quirk = os.environ.get("SUREL_LSTM_PAD_QUIRK") == "1"

    def reset_parameters(self):
        self.lstm.reset_parameters()

    def forward(self, x, seg, nseg, lengths):
        # vectorized padding (one index_put) — identical values to
        # torch.split + pad_sequence, but without materializing nseg
        # python tensor objects per batch (r5: the split/pad path's
        # object churn and its cat-of-grads backward dominated the
        # oracle's 37 min/epoch on this 4-core box)
        T = int(lengths.max().item())
        starts = torch.zeros(nseg, dtype=torch.long)
        torch.cumsum(lengths[:-1], 0, out=starts[1:])
        pos = torch.arange(x.shape[0]) - starts[seg]
        padded = x.new_zeros(nseg, T, x.shape[-1])
        padded[seg, pos] = x
        if self.pad_quirk:
            out, _ = self.lstm(padded)
            return out[:, -1]
        return self._cell_loop(padded, lengths)

    def _cell_loop(self, padded, lengths):
        """Exact final-hidden-at-last-valid-element semantics via a
        tensorized cell loop over time. Mathematically identical to
        pack_padded_sequence + nn.LSTM (same parameters, same gate
        order i,f,g,o; verified by _self_check) — but its autograd
        graph is T matmul steps instead of packed-sequence ops, which
        on CPU makes the backward ~100x faster (one packed backward of
        a 412k-row batch measured >590 s)."""
        if not getattr(self, "_checked", False):
            self._self_check(padded[:64, :, :], lengths[:64])
            self._checked = True
        w_ih = self.lstm.weight_ih_l0          # [4H, H]
        w_hh = self.lstm.weight_hh_l0
        bias = self.lstm.bias_ih_l0 + self.lstm.bias_hh_l0
        nseg, T, hd = padded.shape
        hh = w_hh.shape[1]
        xg = padded @ w_ih.T + bias            # [nseg, T, 4H] one GEMM
        h = padded.new_zeros(nseg, hh)
        c = padded.new_zeros(nseg, hh)
        for t in range(T):
            g = xg[:, t] + h @ w_hh.T
            gi = torch.sigmoid(g[:, :hh])
            gf = torch.sigmoid(g[:, hh:2 * hh])
            gg = torch.tanh(g[:, 2 * hh:3 * hh])
            go = torch.sigmoid(g[:, 3 * hh:])
            nc = gf * c + gi * gg
            nh = go * torch.tanh(nc)
            keep = (t < lengths).unsqueeze(1)
            c = torch.where(keep, nc, c)
            h = torch.where(keep, nh, h)
        return h

    def _self_check(self, padded, lengths):
        """Assert the cell loop reproduces nn.LSTM on a real sub-batch."""
        with torch.no_grad():
            packed = torch.nn.utils.rnn.pack_padded_sequence(
                padded, lengths.clamp(min=1), batch_first=True,
                enforce_sorted=False)
            _, (h_n, _) = self.lstm(packed)
            ref = h_n.squeeze(0)
            w_ih, w_hh = self.lstm.weight_ih_l0, self.lstm.weight_hh_l0
            bias = self.lstm.bias_ih_l0 + self.lstm.bias_hh_l0
            hh = w_hh.shape[1]
            xg = padded @ w_ih.T + bias
            h = padded.new_zeros(padded.shape[0], hh)
            c = padded.new_zeros(padded.shape[0], hh)
            for t in range(padded.shape[1]):
                g = xg[:, t] + h @ w_hh.T
                nc = (torch.sigmoid(g[:, hh:2 * hh]) * c
                      + torch.sigmoid(g[:, :hh])
                      * torch.tanh(g[:, 2 * hh:3 * hh]))
                nh = torch.sigmoid(g[:, 3 * hh:]) * torch.tanh(nc)
                keep = (t < lengths).unsqueeze(1)
                c = torch.where(keep, nc, c)
                h = torch.where(keep, nh, h)
            err = (h - ref).abs().max().item()
            assert err < 1e-5, f"cell loop != nn.LSTM: {err}"


class TorchNet(torch.nn.Module):
    """model.py:45-104: pe_embedding MLP over the [rows, 2, S] encoding
    pairs, pair-sum, then mean / gated-attention / LSTM aggregation by
    indptr segments (aggrs selects, exactly as model.py:59-67)."""

    def __init__(self, input_dim: int, hidden_dim: int, dropout: float,
                 aggrs: str = "mean"):
        super().__init__()
        self.aggrs = aggrs
        self.pe1 = torch.nn.Linear(input_dim, hidden_dim)
        self.pe2 = torch.nn.Linear(hidden_dim, hidden_dim)
        if aggrs == "attn":
            self.aggr = AttnAggregation(hidden_dim)
        elif aggrs == "lstm":
            self.aggr = LSTMAggregation(hidden_dim)
        self.affinity_score = MergeLayer(2 * hidden_dim, hidden_dim,
                                         dropout)
        self.reset_parameters()

    def reset_parameters(self):
        for lin in (self.pe1, self.pe2):
            lin.reset_parameters()
            torch.nn.init.xavier_normal_(lin.weight)
        if self.aggrs != "mean":
            self.aggr.reset_parameters()
        self.affinity_score.reset_parameters()

    def forward(self, pairs, indptr, enc):
        """pairs: [rows, 2] long indices into enc; indptr: [2B+1] long.

        The reference materializes xz = enc[pairs] ([rows, 2, S]) and
        runs the pe MLP on every row (model.py:76-78) — but enc has only
        a few hundred unique rows after the sampler's bit-hash dedup, so
        the (enc_u, enc_v) pair vocabulary per batch is ~1000x smaller
        than the row count. We run the pe MLP (and, for attn, the
        gate/value Linears) once per UNIQUE pair and gather the results
        back — the same function evaluated on the same values, so the
        forward is numerically identical (parameter gradients differ
        only in float summation order). `_self_check` asserts this
        against the dense path on the first batch."""
        if self.training and not getattr(self, "_checked", False):
            self._self_check(pairs, indptr, enc)
            self._checked = True
        nenc = enc.shape[0]
        key = pairs[:, 0] * nenc + pairs[:, 1]
        uniq, inv = torch.unique(key, return_inverse=True)
        up = torch.stack([uniq // nenc, uniq % nenc], dim=1)
        xz_u = enc[up]                                   # [U, 2, S]
        h_u = self.pe2(torch.relu(self.pe1(xz_u))).sum(dim=-2)  # [U, H]
        nseg = indptr.numel() - 1
        lengths = indptr[1:] - indptr[:-1]
        seg = torch.repeat_interleave(torch.arange(nseg), lengths)
        if self.aggrs == "attn":
            agg = self.aggr.forward_dedup(h_u, inv, seg, nseg).view(
                2, -1, h_u.shape[-1])
        elif self.aggrs == "lstm":
            x = h_u[inv]
            agg = self.aggr(x, seg, nseg, lengths).view(
                2, -1, x.shape[-1])
        else:
            x = h_u[inv]
            sums = torch.zeros(nseg, x.shape[-1], dtype=x.dtype)
            sums.index_add_(0, seg, x)
            cnt = lengths.clamp(min=1).unsqueeze(1)
            agg = (sums / cnt).view(2, -1, x.shape[-1])
        return self.affinity_score(agg[0], agg[1])

    def _forward_dense(self, pairs, indptr, enc):
        """The reference's literal computation (model.py:76-90): pe MLP
        on every materialized [rows, 2, S] row. Used only by
        _self_check; O(rows) matmuls make it ~10s/batch on this box."""
        xz = enc[pairs]
        x = self.pe2(torch.relu(self.pe1(xz))).sum(dim=-2)  # [rows, H]
        nseg = indptr.numel() - 1
        lengths = indptr[1:] - indptr[:-1]
        seg = torch.repeat_interleave(torch.arange(nseg), lengths)
        if self.aggrs == "attn":
            agg = self.aggr(x, seg, nseg).view(2, -1, x.shape[-1])
        elif self.aggrs == "lstm":
            agg = self.aggr(x, seg, nseg, lengths).view(
                2, -1, x.shape[-1])
        else:
            sums = torch.zeros(nseg, x.shape[-1], dtype=x.dtype)
            sums.index_add_(0, seg, x)
            cnt = lengths.clamp(min=1).unsqueeze(1)
            agg = (sums / cnt).view(2, -1, x.shape[-1])
        return self.affinity_score(agg[0], agg[1])

    def _self_check(self, pairs, indptr, enc):
        was_training = self.training
        self.eval()   # disable MergeLayer dropout for a deterministic diff
        with torch.no_grad():
            dense = self._forward_dense(pairs, indptr, enc)
            self._checked = True   # keep forward() from recursing
            dedup = self.forward(pairs, indptr, enc)
        err = (dense - dedup).abs().max().item()
        assert err < 1e-4, f"dedup forward != dense reference: {err}"
        log.info("dedup forward self-check ok: max |Δlogit| = %.2e "
                 "(rows=%d, unique pairs=%d)", err, pairs.shape[0],
                 len(torch.unique(pairs[:, 0] * enc.shape[0]
                                  + pairs[:, 1])))
        if was_training:
            self.train()


# ---------------------------------------------------------------------------
# Reference gather semantics (train.py:13-45): scipy row slice, boolean
# masks, cross join via x.multiply(mask) + mask, encode-table lookup.

def gather(edge: np.ndarray, X, enc: np.ndarray):
    """edge [2, B] -> (pairs [rows, 2] long enc-row ids, indptr [2B+1]).

    The reference returns enc[pairs] directly (train.py:34-37); we defer
    the table lookup to TorchNet.forward so it can dedup unique pairs."""
    xl, xr = X[edge[0]], X[edge[1]]
    for m in (xl, xr):
        m.sort_indices()
    lmask, rmask = xl > 0, xr > 0
    indptr = np.concatenate([xl.indptr[:-1], xl.indptr[-1] + xr.indptr])
    xrl = (xr.multiply(lmask) + lmask).tocsr()
    xlr = (xl.multiply(rmask) + rmask).tocsr()
    for m in (xrl, xlr):
        m.sort_indices()
    pl = np.stack([xl.data, xrl.data - 1]).T      # [nl, 2] enc ids
    pr = np.stack([xr.data, xlr.data - 1]).T
    pairs = np.vstack([pl, pr]).astype(np.int64)
    return (torch.from_numpy(pairs),
            torch.from_numpy(indptr).long())


def predict_split(model, edges, X, enc, batch_size):
    model.eval()
    enc_t = torch.from_numpy(enc).float()
    out = []
    with torch.no_grad():
        for lo in range(0, edges.shape[1], batch_size):
            pairs, ptr = gather(edges[:, lo:lo + batch_size], X, enc)
            out.append(torch.sigmoid(model(pairs, ptr, enc_t)))
    return torch.cat(out).numpy()


def run(cfg: ExperimentConfig) -> ResultLogger:
    rng = set_random_seed(cfg.seed)
    from surel_plus_tpu.graph.datasets import fixture_link_data

    assert cfg.dataset.startswith("fixture-"), "head-to-head is fixture-only"
    raw = fixture_link_data(cfg.dataset.split("-", 1)[1])
    ds = LinkPropDataset(raw, mask_ratio=cfg.train_ratio, k=cfg.k,
                         use_weight=cfg.use_weight,
                         use_coalesce=cfg.use_weight,
                         use_val=cfg.use_val, rng=rng)
    graphs = ds.process(log)
    val_edge = get_pos_neg_edges("valid", raw.split_edge, raw.edge_index,
                                 ds.num_nodes, percent=cfg.valid_perc,
                                 rng=rng)
    test_edge = get_pos_neg_edges("test", raw.split_edge, raw.edge_index,
                                  ds.num_nodes, rng=rng)
    G_obsrv, G_inf = graphs["train"], graphs["test"]

    t0 = time.time()
    x_spg = subg_matrix(G_obsrv, np.arange(G_obsrv.num_nodes,
                                           dtype=np.int32),
                        num_walks=cfg.num_walks, num_steps=cfg.num_steps,
                        seed=cfg.seed)
    z_spg = subg_matrix(G_inf, np.arange(G_inf.num_nodes, dtype=np.int32),
                        num_walks=cfg.num_walks, num_steps=cfg.num_steps,
                        seed=cfg.seed)
    X = x_spg.to_scipy(ds.num_nodes)
    Z = z_spg.to_scipy(ds.num_nodes)
    # normalized landing probabilities (main.py:174)
    xpe = x_spg.enc.astype(np.float32) / cfg.num_walks
    zpe = z_spg.enc.astype(np.float32) / cfg.num_walks
    log.info("prep %.1fs: X nnz %d, Z nnz %d, enc %s/%s",
             time.time() - t0, X.nnz, Z.nnz, xpe.shape, zpe.shape)

    edges = np.concatenate([ds.pos_edge.T, ds.neg_edge.T],
                           axis=1).astype(np.int64)
    labels = torch.from_numpy(np.concatenate([
        np.ones(len(ds.pos_edge), np.float32),
        np.zeros(len(ds.neg_edge), np.float32)]))

    rlog = ResultLogger(runs=cfg.runs, metric=cfg.metric,
                        early_stop=cfg.early_stop)
    model = TorchNet(cfg.num_steps, cfg.hidden_channels, cfg.dropout,
                     aggrs=cfg.aggrs)

    for run_i in range(cfg.runs):
        torch.manual_seed(cfg.seed + run_i)
        model.reset_parameters()
        opt = torch.optim.Adam(model.parameters(), lr=cfg.lr)
        loss_fn = torch.nn.BCEWithLogitsLoss()
        for epoch in range(cfg.epochs):
            model.train()
            perm = torch.randperm(edges.shape[1]).numpy()
            tot_loss, tot_n = 0.0, 0
            preds, labs = [], []
            t1 = time.time()
            xpe_t = torch.from_numpy(xpe).float()
            for lo in range(0, len(perm), cfg.batch_size):
                sel = perm[lo:lo + cfg.batch_size]
                opt.zero_grad()
                pairs, ptr = gather(edges[:, sel], X, xpe)
                pred = model(pairs, ptr, xpe_t)
                target = labels[sel]
                loss = loss_fn(pred, target)
                # reference order: clip THEN backward (train.py:131-133)
                # — after zero_grad this clips ZERO grads, i.e. the
                # reference effectively trains UNCLIPPED. The framework
                # fixes this (optax clip_by_global_norm applies to the
                # real grads); SUREL_ORACLE_CLIP_FIX=1 mirrors the fix
                # here to isolate its accuracy effect (r5: decisive for
                # the LSTM aggregator, whose unclipped training ranks
                # far below the clipped framework run).
                if os.environ.get("SUREL_ORACLE_CLIP_FIX") == "1":
                    loss.backward()
                    torch.nn.utils.clip_grad_norm_(model.parameters(),
                                                   max_norm=1.0)
                else:
                    torch.nn.utils.clip_grad_norm_(model.parameters(),
                                                   max_norm=1.0)
                    loss.backward()
                opt.step()
                tot_loss += loss.item() * len(sel)
                tot_n += len(sel)
                preds.append(torch.sigmoid(pred.detach()).numpy())
                labs.append(target.numpy())
            auc = metrics_ops.roc_auc(np.concatenate(labs),
                                      np.concatenate(preds))
            log.info("Run: %02d, Epoch: %02d, Loss: %.4f, AUC: %.4f "
                     "(%.1fs)", run_i + 1, epoch, tot_loss / tot_n, auc,
                     time.time() - t1)
            if epoch % cfg.eval_steps == 0:
                pv = predict_split(model, val_edge[0], Z, zpe,
                                   cfg.batch_size)
                nv = predict_split(model, val_edge[1], Z, zpe,
                                   cfg.batch_size)
                pt = predict_split(model, test_edge[0], Z, zpe,
                                   cfg.batch_size)
                nt = predict_split(model, test_edge[1], Z, zpe,
                                   cfg.batch_size)
                if "MRR" in cfg.metric:
                    # inference_mrr semantics (reference train.py:
                    # 245-280): per-source negatives, reshape [-1, k],
                    # OGB mrr_list mean
                    k_v = len(nv) // max(len(pv), 1)
                    k_t = len(nt) // max(len(pt), 1)
                    results = (
                        0,
                        metrics_ops.mrr(pv, nv[:len(pv) * k_v]
                                        .reshape(-1, k_v)),
                        metrics_ops.mrr(pt, nt[:len(pt) * k_t]
                                        .reshape(-1, k_t)))
                else:
                    results = {}
                    for k in (10, 20, 50, 100):
                        results[f"Hits@{k}"] = (
                            0, metrics_ops.hits_at_k(pv, nv, k),
                            metrics_ops.hits_at_k(pt, nt, k))
                log.info("eval: %s", results)
                if rlog.add_result(run_i, results):
                    break
        rlog.print_statistics(run=run_i, logger=log)
    if cfg.runs > 1:
        rlog.print_statistics(logger=log)
    return rlog


def main(argv=None):
    logging.basicConfig(level=logging.INFO, stream=sys.stderr,
                        format="%(relativeCreated)8.0fms %(message)s")
    parser = argparse.ArgumentParser()
    add_config_args(parser)
    args = parser.parse_args(argv)
    cfg = apply_dataset_overrides(config_from_args(args))
    rlog = run(cfg)
    print([rlog.best(r) for r in range(cfg.runs)])


if __name__ == "__main__":
    main()
