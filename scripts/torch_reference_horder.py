"""Reference-semantics torch HONet head-to-head on the hypergraph fixture.

Re-states the reference's higher-order pipeline (main_horder.py:24-141)
on the SAME recorded data our CLI consumes: DEHyperDataset.from_npz
(identical train/eval triplets and recorded negatives), subg_matrix with
the same seed (identical SpG samples), exported to the reference's
scipy-CSR + encoding-table layout. Training runs the reference's exact
semantics: hgather's 4 segment groups (train.py:48-72 — (u with w-cross,
w with u-cross, v with w-cross, w with v-cross)), HONet
(model_horder.py:42-66: pe_embedding MLP -> pair-sum -> scatter_mean by
segment -> 4-group MergeLayer cat->fc1->relu->dropout->fc2),
BCEWithLogitsLoss + Adam with the stale clip-before-backward
(train.py:131-133, kept for fidelity), and eval_model_horder MRR
(train.py:283-317: per-triplet negatives, mrr_list mean).

Like scripts/torch_reference_fixture.py, the pe MLP runs once per UNIQUE
(own_enc, cross_enc) pair and gathers back (numerically identical
forward; asserted on the first batch).

Usage (CPU):
  python scripts/torch_reference_horder.py \
      --dataset npz:surel_plus_tpu/data/fixtures/tags_fixture.npz \
      --num_walks 100 --num_steps 3 --k 10 --epochs 10 --eval_steps 2 \
      --early_stop 10 --runs 3 --batch_size 4096
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

from surel_plus_tpu.graph.datasets import DEHyperDataset
from surel_plus_tpu.graph.splits import get_pos_neg_edges
from surel_plus_tpu.ops import metrics as metrics_ops
from surel_plus_tpu.ops.sampler import subg_matrix
from surel_plus_tpu.utils.config import (
    ExperimentConfig, add_config_args, config_from_args)
from surel_plus_tpu.utils.logger import ResultLogger
from surel_plus_tpu.utils.seeding import set_random_seed

log = logging.getLogger("torch_ref_horder")


class TorchHONet(torch.nn.Module):
    """model_horder.py:42-66: pe_embedding -> pair-sum -> scatter_mean
    -> MergeLayer(x1..x4) = cat -> fc1 -> relu -> dropout -> fc2."""

    def __init__(self, input_dim: int, hidden_dim: int, dropout: float):
        super().__init__()
        self.pe1 = torch.nn.Linear(input_dim, hidden_dim)
        self.pe2 = torch.nn.Linear(hidden_dim, hidden_dim)
        self.fc1 = torch.nn.Linear(4 * hidden_dim, hidden_dim)
        self.fc2 = torch.nn.Linear(hidden_dim, 1)
        self.dropout = dropout
        self.reset_parameters()

    def reset_parameters(self):
        for lin in (self.pe1, self.pe2, self.fc1, self.fc2):
            lin.reset_parameters()
        # reference inits: xavier_normal_ on pe layers
        # (model_horder.py:60-64) and on both MergeLayer fcs (:15-16)
        for lin in (self.pe1, self.pe2, self.fc1, self.fc2):
            torch.nn.init.xavier_normal_(lin.weight)

    def forward(self, pairs, ind, nseg, enc):
        """pairs: [rows, 2] long enc-row ids; ind: [rows] segment ids in
        [0, nseg); nseg = 4 * B. The reference materializes
        enc[pairs] and runs the pe MLP per row (model_horder.py:57);
        we dedup unique pairs (same values, same function — see module
        docstring)."""
        if self.training and not getattr(self, "_checked", False):
            self._self_check(pairs, ind, nseg, enc)
            self._checked = True
        nenc = enc.shape[0]
        key = pairs[:, 0] * nenc + pairs[:, 1]
        uniq, inv = torch.unique(key, return_inverse=True)
        up = torch.stack([uniq // nenc, uniq % nenc], dim=1)
        h_u = self.pe2(torch.relu(self.pe1(enc[up]))).sum(dim=-2)
        x = h_u[inv]                                     # [rows, H]
        sums = torch.zeros(nseg, x.shape[-1], dtype=x.dtype)
        sums.index_add_(0, ind, x)
        cnt = torch.zeros(nseg, dtype=x.dtype)
        cnt.index_add_(0, ind, torch.ones_like(ind, dtype=x.dtype))
        mean = sums / cnt.clamp(min=1).unsqueeze(1)      # scatter_mean
        x1, x2, x3, x4 = mean.view(4, -1, x.shape[-1])
        h = torch.relu(self.fc1(torch.cat([x1, x2, x3, x4], dim=-1)))
        h = torch.nn.functional.dropout(h, p=self.dropout,
                                        training=self.training)
        return self.fc2(h).squeeze(-1)

    def _forward_dense(self, pairs, ind, nseg, enc):
        xz = enc[pairs]                                  # [rows, 2, S]
        x = self.pe2(torch.relu(self.pe1(xz))).sum(dim=-2)
        sums = torch.zeros(nseg, x.shape[-1], dtype=x.dtype)
        sums.index_add_(0, ind, x)
        cnt = torch.zeros(nseg, dtype=x.dtype)
        cnt.index_add_(0, ind, torch.ones_like(ind, dtype=x.dtype))
        mean = sums / cnt.clamp(min=1).unsqueeze(1)
        x1, x2, x3, x4 = mean.view(4, -1, x.shape[-1])
        h = torch.relu(self.fc1(torch.cat([x1, x2, x3, x4], dim=-1)))
        return self.fc2(h).squeeze(-1)

    def _self_check(self, pairs, ind, nseg, enc):
        was_training = self.training
        self.eval()
        with torch.no_grad():
            dense = self._forward_dense(pairs, ind, nseg, enc)
            self._checked = True
            dedup = self.forward(pairs, ind, nseg, enc)
        err = (dense - dedup).abs().max().item()
        assert err < 1e-4, f"dedup forward != dense reference: {err}"
        log.info("dedup self-check ok: max dlogit %.2e (rows=%d)",
                 err, pairs.shape[0])
        if was_training:
            self.train()


def hgather(hedge: np.ndarray, X, enc: np.ndarray):
    """train.py:48-72: 4 segment groups (xu|xwu, xw|xuw, xv|xwv, xw|xvw)
    as (pairs [rows, 2] enc ids, ind [rows], nseg = 4B)."""
    xu, xv, xw = X[hedge[0]], X[hedge[1]], X[hedge[2]]
    for m in (xu, xv, xw):
        m.sort_indices()
    umask, vmask, wmask = xu > 0, xv > 0, xw > 0
    usize = umask.getnnz(axis=1)
    vsize = vmask.getnnz(axis=1)
    wsize = wmask.getnnz(axis=1)
    node_size = np.concatenate([usize, wsize, vsize, wsize])
    ind = np.repeat(np.arange(len(usize) * 4), node_size)
    xwu = (xw.multiply(umask) + umask).tocsr()
    xuw = (xu.multiply(wmask) + wmask).tocsr()
    xwv = (xw.multiply(vmask) + vmask).tocsr()
    xvw = (xv.multiply(wmask) + wmask).tocsr()
    for m in (xwu, xuw, xwv, xvw):
        m.sort_indices()
    pu = np.stack([xu.data, xwu.data - 1]).T
    pw0 = np.stack([xw.data, xuw.data - 1]).T
    pv = np.stack([xv.data, xwv.data - 1]).T
    pw1 = np.stack([xw.data, xvw.data - 1]).T
    pairs = np.vstack([pu, pw0, pv, pw1]).astype(np.int64)
    assert pairs.shape[0] == len(ind)
    return (torch.from_numpy(pairs), torch.from_numpy(ind).long(),
            4 * hedge.shape[1])


def predict_split(model, hedges, X, enc, batch_size):
    model.eval()
    enc_t = torch.from_numpy(enc).float()
    out = []
    with torch.no_grad():
        for lo in range(0, hedges.shape[1], batch_size):
            pairs, ind, nseg = hgather(hedges[:, lo:lo + batch_size],
                                       X, enc)
            out.append(torch.sigmoid(model(pairs, ind, nseg, enc_t)))
    return torch.cat(out).numpy()


def run(cfg: ExperimentConfig) -> ResultLogger:
    set_random_seed(cfg.seed)
    assert cfg.dataset.startswith("npz:"), "hypergraph oracle is npz-only"
    ds = DEHyperDataset.from_npz(cfg.dataset[4:], k=cfg.k)
    G_enc = ds.process(log)

    val_edge = get_pos_neg_edges("valid", ds.split_edge, None,
                                 ds.num_nodes, percent=cfg.valid_perc)
    test_edge = get_pos_neg_edges("test", ds.split_edge, None,
                                  ds.num_nodes)

    t0 = time.time()
    x_spg = subg_matrix(G_enc, np.arange(G_enc.num_nodes,
                                         dtype=np.int32),
                        num_walks=cfg.num_walks, num_steps=cfg.num_steps,
                        seed=cfg.seed)
    X = x_spg.to_scipy(ds.num_nodes)
    xpe = x_spg.enc.astype(np.float32) / cfg.num_walks
    log.info("prep %.1fs: X nnz %d, enc %s", time.time() - t0, X.nnz,
             xpe.shape)

    pos, neg = ds.pos_hedge.T, ds.neg_hedge.T          # [3, T], [3, T*k]
    edges = np.concatenate([pos, neg], axis=1).astype(np.int64)
    labels = torch.from_numpy(np.concatenate([
        np.ones(pos.shape[1], np.float32),
        np.zeros(neg.shape[1], np.float32)]))

    rlog = ResultLogger(runs=cfg.runs, metric="MRR",
                        early_stop=cfg.early_stop)
    model = TorchHONet(cfg.num_steps, cfg.hidden_channels, cfg.dropout)
    xpe_t = torch.from_numpy(xpe).float()

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
            for lo in range(0, len(perm), cfg.batch_size):
                sel = perm[lo:lo + cfg.batch_size]
                opt.zero_grad()
                pairs, ind, nseg = hgather(edges[:, sel], X, xpe)
                pred = model(pairs, ind, nseg, xpe_t)
                target = labels[sel]
                loss = loss_fn(pred, target)
                # reference order: clip THEN backward (train.py:131-133)
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
                pv = predict_split(model, val_edge[0], X, xpe,
                                   cfg.batch_size)
                nv = predict_split(model, val_edge[1], X, xpe,
                                   cfg.batch_size)
                pt = predict_split(model, test_edge[0], X, xpe,
                                   cfg.batch_size)
                nt = predict_split(model, test_edge[1], X, xpe,
                                   cfg.batch_size)
                k_v = len(nv) // max(len(pv), 1)
                k_t = len(nt) // max(len(pt), 1)
                results = (
                    0,
                    metrics_ops.mrr(pv, nv[:len(pv) * k_v]
                                    .reshape(-1, k_v)),
                    metrics_ops.mrr(pt, nt[:len(pt) * k_t]
                                    .reshape(-1, k_t)))
                log.info("eval MRR: %s", results)
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
    cfg = config_from_args(args)
    rlog = run(cfg)
    print([rlog.best(r) for r in range(cfg.runs)])


if __name__ == "__main__":
    main()
