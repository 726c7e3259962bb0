import numpy as np
import pytest

from surel_plus_tpu.ops.metrics import (
    Evaluator, evaluator_for, hits_at_k, mrr, roc_auc)


def test_hits_at_k():
    pos = np.array([0.9, 0.5, 0.1])
    neg = np.array([0.8, 0.6, 0.4, 0.2])
    # k=2: 2nd highest neg = 0.6 -> pos > 0.6: only 0.9
    assert hits_at_k(pos, neg, 2) == pytest.approx(1 / 3)
    assert hits_at_k(pos, neg, 4) == pytest.approx(2 / 3)
    assert hits_at_k(pos, neg, 10) == 1.0  # fewer negs than k


def test_mrr_ogb_semantics():
    pos = np.array([0.9, 0.3])
    neg = np.array([[0.5, 0.4], [0.5, 0.4]])
    # q0: rank 1 -> 1.0 ; q1: rank 3 -> 1/3
    assert mrr(pos, neg) == pytest.approx((1.0 + 1 / 3) / 2)
    # ties count against the positive (>=)
    assert mrr(np.array([0.5]), np.array([[0.5]])) == pytest.approx(0.5)


def test_roc_auc_matches_sklearn():
    from sklearn.metrics import roc_auc_score
    rng = np.random.default_rng(0)
    labels = rng.integers(0, 2, 500)
    scores = rng.random(500) + labels * 0.3
    # inject ties
    scores = np.round(scores, 2)
    assert roc_auc(labels, scores) == pytest.approx(
        roc_auc_score(labels, scores), abs=1e-9)


def test_evaluator_dispatch():
    ev = evaluator_for("ogbl-collab")
    ev.K = 50
    out = ev.eval({"y_pred_pos": np.array([1.0]),
                   "y_pred_neg": np.array([0.0, 0.5])})
    assert out["hits@50"] == 1.0
    ev = evaluator_for("ogbl-citation2")
    out = ev.eval({"y_pred_pos": np.array([1.0, 0.0]),
                   "y_pred_neg": np.array([[0.5], [0.5]])})
    assert out["mrr_list"].shape == (2,)
    ev = evaluator_for("ogbl-vessel")
    out = ev.eval({"y_pred_pos": np.array([0.9, 0.8]),
                   "y_pred_neg": np.array([0.1, 0.2])})
    assert out["rocauc"] == 1.0
