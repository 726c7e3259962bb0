"""End-to-end slice: synthetic link data -> sampling -> SpG -> SpJoin ->
Net -> train epochs -> eval metrics. The minimum pipeline of SURVEY.md §7."""

import jax
import numpy as np
import pytest

from surel_plus_tpu.graph.datasets import LinkPropDataset, synthetic_link_data
from surel_plus_tpu.graph.splits import get_pos_neg_edges
from surel_plus_tpu.models import Net
from surel_plus_tpu.ops.sampler import subg_matrix
from surel_plus_tpu.train import LinkPredictor, TrainConfig, evaluate
from surel_plus_tpu.utils.logger import ResultLogger


@pytest.fixture(scope="module")
def pipeline():
    raw = synthetic_link_data(num_nodes=400, num_edges=2400, seed=0)
    ds = LinkPropDataset(raw, mask_ratio=0.25, k=2,
                         rng=np.random.default_rng(0))
    graphs = ds.process()
    seeds = np.arange(400, dtype=np.int32)
    spg = subg_matrix(graphs["train"], seeds, num_walks=16, num_steps=3,
                      block_size=400)
    cfg = TrainConfig(batch_size=256, lr=3e-3, epochs=6, seed=0)
    model = Net(input_dim=3, hidden_dim=32, aggrs="mean", dropout=0.1)
    pred = LinkPredictor(model, spg, cfg)
    edges = np.concatenate([ds.pos_edge.T, ds.neg_edge.T],
                           axis=1).astype(np.int32)
    labels = np.concatenate([np.ones(len(ds.pos_edge)),
                             np.zeros(len(ds.neg_edge))]).astype(np.float32)
    return raw, ds, spg, cfg, pred, edges, labels


def test_train_improves(pipeline):
    raw, ds, spg, cfg, pred, edges, labels = pipeline
    params, opt_state = pred.init(jax.random.PRNGKey(0), edges[:, :cfg.batch_size])
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(1)
    losses, aucs = [], []
    for _ in range(cfg.epochs):
        params, opt_state, loss, auc = pred.train_epoch(
            params, opt_state, edges, labels, rng, key)
        losses.append(loss)
        aucs.append(auc)
    assert losses[-1] < losses[0]
    assert aucs[-1] > 0.65, f"train AUC too low: {aucs}"

    # evaluation over valid/test splits
    val = get_pos_neg_edges("valid", raw.split_edge, raw.edge_index, 400,
                            rng=np.random.default_rng(1))
    test = get_pos_neg_edges("test", raw.split_edge, raw.edge_index, 400,
                             rng=np.random.default_rng(2))
    inf_edge = {"valid": val, "test": test}
    results, t_inf = evaluate(pred, params, inf_edge, "Hits@50")
    assert set(results) == {"Hits@10", "Hits@20", "Hits@50", "Hits@100"}
    for k, (tr, va, te) in results.items():
        assert 0.0 <= va <= 1.0 and 0.0 <= te <= 1.0
    # AUC metric path
    (auc_tr, auc_va, auc_te), _ = evaluate(pred, params, inf_edge, "AUC")
    assert 0.3 <= auc_te <= 1.0
    # MRR path (reshape negatives per positive)
    (m_tr, m_va, m_te), _ = evaluate(pred, params, inf_edge, "MRR")
    assert 0.0 < m_te <= 1.0


def test_result_logger_early_stop():
    rlog = ResultLogger(runs=1, metric="MRR", early_stop=2)
    assert not rlog.add_result(0, (0, 0.5, 0.4))
    assert not rlog.add_result(0, (0, 0.6, 0.5))
    assert not rlog.add_result(0, (0, 0.55, 0.45))
    # 2 evals past the best -> stop
    assert rlog.add_result(0, (0, 0.54, 0.44))
    best_valid, final_test = rlog.best(0)
    assert best_valid == 0.6 and final_test == 0.5


def test_result_logger_hits_dict():
    rlog = ResultLogger(runs=1, metric="Hits@50", early_stop=-1)
    res = {"Hits@10": (0, 0.1, 0.1), "Hits@50": (0, 0.5, 0.45),
           "Hits@100": (0, 0.9, 0.8)}
    assert not rlog.add_result(0, res)
    assert rlog.best(0) == (0.5, 0.45)


def test_checkpoint_roundtrip(tmp_path, pipeline):
    from surel_plus_tpu.utils.checkpoint import (load_checkpoint,
                                                 save_checkpoint)
    raw, ds, spg, cfg, pred, edges, labels = pipeline
    params, opt_state = pred.init(jax.random.PRNGKey(0),
                                  edges[:, :cfg.batch_size])
    state = {"params": params, "epoch": np.asarray(3)}
    p = save_checkpoint(state, str(tmp_path / "ckpt"))
    restored = load_checkpoint(p)
    assert int(restored["epoch"]) == 3
    a = jax.tree.leaves(params)[0]
    b = jax.tree.leaves(restored["params"])[0]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
