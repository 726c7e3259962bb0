"""Training and evaluation engine.

Reference semantics (train.py:114-317): per-batch SpJoin gather -> model ->
BCE-with-logits -> grad clip (1.0) -> Adam; epoch ROC-AUC over train
predictions; batched inference over pos/neg splits feeding Hits/MRR/AUC.

TPU design: the join runs *inside* the jitted step on device SpG tiles (the
reference burns 4 host threads on SciPy slicing per batch, train.py:88-99);
batches have a fixed static size with a validity weight for the final
partial batch; the whole step (join + forward + backward + update) is one
XLA program. Note: the reference calls `clip_grad_norm_` *before*
`loss.backward()` (train.py:131-132), clipping stale grads — a no-op bug.
We clip the actual gradients (optax.clip_by_global_norm), i.e. the intended
behavior; divergence documented here.
"""

from __future__ import annotations

import dataclasses
import logging
import time
from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from surel_plus_tpu.ops import metrics as metrics_ops
from surel_plus_tpu.ops.join import gather_join
from surel_plus_tpu.spg.spg import SpG

log = logging.getLogger(__name__)


@dataclasses.dataclass
class TrainConfig:
    batch_size: int = 1024
    lr: float = 1e-3
    epochs: int = 200
    eval_steps: int = 5
    early_stop: int = -1
    grad_clip: float = 1.0
    seed: int = 0


class LinkPredictor:
    """Binds a model, an optimizer, and a device-resident SpG; exposes
    jitted train/score functions with static batch shapes."""

    def __init__(self, model, spg: SpG, config: TrainConfig,
                 join_fn: Callable = gather_join,
                 feature: Optional[np.ndarray] = None):
        self.model = model
        self.config = config
        self.join_fn = join_fn
        self.dev = spg.device()
        self.feature = jnp.asarray(feature) if feature is not None else None
        self.optimizer = optax.chain(
            optax.clip_by_global_norm(config.grad_clip),
            optax.adam(config.lr),
        )
        self._step = self._build_step()
        self._score = self._build_score()

    # -- initialization ----------------------------------------------------
    def init(self, rng: jax.Array, example_edges: np.ndarray):
        joined = self.join_fn(self.dev.nodes, self.dev.eidx, self.dev.sizes,
                              jnp.asarray(example_edges))
        feat = self._edge_features(jnp.asarray(example_edges))
        params = self.model.init(rng, self.dev.enc, joined, feat)
        opt_state = self.optimizer.init(params)
        return params, opt_state

    def _edge_features(self, edges):
        if self.feature is None:
            return None
        return self.feature[edges]

    # -- jitted programs ---------------------------------------------------
    def _build_step(self):
        @jax.jit
        def step(params, opt_state, edges, labels, weights, rng):
            joined = self.join_fn(self.dev.nodes, self.dev.eidx,
                                  self.dev.sizes, edges)
            feat = self._edge_features(edges)

            def loss_fn(p):
                logits = self.model.apply(
                    p, self.dev.enc, joined, feat, train=True,
                    rngs={"dropout": rng})
                per = optax.sigmoid_binary_cross_entropy(logits, labels)
                return (per * weights).sum() / jnp.maximum(
                    weights.sum(), 1.0), logits

            (loss, logits), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params)
            updates, opt_state = self.optimizer.update(grads, opt_state,
                                                       params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss, logits

        return step

    def _build_score(self):
        @jax.jit
        def score(params, edges):
            joined = self.join_fn(self.dev.nodes, self.dev.eidx,
                                  self.dev.sizes, edges)
            feat = self._edge_features(edges)
            logits = self.model.apply(params, self.dev.enc, joined, feat,
                                      train=False)
            return jax.nn.sigmoid(logits)

        return score

    # -- host loops --------------------------------------------------------
    def train_epoch(self, params, opt_state, edges: np.ndarray,
                    labels: np.ndarray, rng: np.random.Generator,
                    dropout_key: jax.Array) -> Tuple:
        """One epoch over [Q, E] edges with [E] labels; returns
        (params, opt_state, mean_loss, auc)."""
        bs = self.config.batch_size
        E = edges.shape[1]
        perm = rng.permutation(E)
        total_loss, total_n = 0.0, 0
        all_preds = np.empty(E, dtype=np.float32)
        all_labels = np.empty(E, dtype=np.float32)
        pos = 0
        for i in range(0, E, bs):
            sel = perm[i:i + bs]
            n = len(sel)
            if n < bs:  # pad to the static batch shape
                sel = np.concatenate([sel, np.zeros(bs - n, dtype=sel.dtype)])
            w = np.zeros(bs, np.float32)
            w[:n] = 1.0
            batch_edges = jnp.asarray(edges[:, sel])
            batch_labels = jnp.asarray(labels[sel].astype(np.float32))
            dropout_key, sub = jax.random.split(dropout_key)
            params, opt_state, loss, logits = self._step(
                params, opt_state, batch_edges, batch_labels,
                jnp.asarray(w), sub)
            total_loss += float(loss) * n
            total_n += n
            preds = jax.nn.sigmoid(logits)
            all_preds[pos:pos + n] = np.asarray(preds)[:n]
            all_labels[pos:pos + n] = labels[sel[:n]]
            pos += n
        auc = metrics_ops.roc_auc(all_labels, all_preds)
        return params, opt_state, total_loss / max(total_n, 1), auc

    def predict(self, params, edges: np.ndarray) -> np.ndarray:
        """Batched scoring of [Q, E] edges -> sigmoid scores [E]."""
        bs = self.config.batch_size
        E = edges.shape[1]
        out = np.empty(E, dtype=np.float32)
        for i in range(0, E, bs):
            chunk = edges[:, i:i + bs]
            n = chunk.shape[1]
            if n < bs:
                chunk = np.concatenate(
                    [chunk, np.zeros((chunk.shape[0], bs - n),
                                     chunk.dtype)], axis=1)
            scores = self._score(params, jnp.asarray(chunk))
            out[i:i + n] = np.asarray(scores)[:n]
        return out


def train_epoch(predictor: LinkPredictor, params, opt_state, edges, labels,
                rng, dropout_key):
    return predictor.train_epoch(params, opt_state, edges, labels, rng,
                                 dropout_key)


def evaluate(predictor: LinkPredictor, params, inf_edge: Dict,
             metric: str, neg_per_pos: Optional[int] = None
             ) -> Tuple[Dict, float]:
    """Reference `inference` / `inference_mrr` (train.py:175-280): score
    valid and test splits, compute the requested metric family.

    inf_edge: {'valid': (pos [2,E], neg), 'test': (pos, neg)} of SpG-row
    edges. Returns (results, test_time) where results mirrors the reference
    shapes: {'Hits@K': (0, valid, test)} or (0, valid, test) tuples.
    """
    def split_scores(split):
        pos_edge, neg_edge = inf_edge[split]
        pos = predictor.predict(params, pos_edge)
        neg = predictor.predict(params, neg_edge)
        return pos, neg

    pos_v, neg_v = split_scores("valid")
    t0 = time.time()
    pos_t, neg_t = split_scores("test")
    t_inf = time.time() - t0

    if "Hits" in metric:
        results = {}
        for k in (10, 20, 50, 100):
            results[f"Hits@{k}"] = (
                0,
                metrics_ops.hits_at_k(pos_v, neg_v, k),
                metrics_ops.hits_at_k(pos_t, neg_t, k),
            )
        return results, t_inf
    if "AUC" in metric:
        lab_v = np.concatenate([np.ones(len(pos_v)), np.zeros(len(neg_v))])
        lab_t = np.concatenate([np.ones(len(pos_t)), np.zeros(len(neg_t))])
        return (0,
                metrics_ops.roc_auc(lab_v, np.concatenate([pos_v, neg_v])),
                metrics_ops.roc_auc(lab_t, np.concatenate([pos_t, neg_t])),
                ), t_inf
    # MRR: negatives grouped per positive (train.py:254,268)
    k_v = len(neg_v) // max(len(pos_v), 1)
    k_t = len(neg_t) // max(len(pos_t), 1)
    return (0,
            metrics_ops.mrr(pos_v, neg_v[:len(pos_v) * k_v].reshape(-1, k_v)),
            metrics_ops.mrr(pos_t, neg_t[:len(pos_t) * k_t].reshape(-1, k_t)),
            ), t_inf
