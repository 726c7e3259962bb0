"""Device-resident training/eval: zero host round-trips inside an epoch.

The host-loop engine (train/loop.py) dispatches one jitted step per batch
and pulls logits for metrics — fine when the host-device link is fast. On
tunneled or high-latency links (and for peak TPU utilization generally),
per-step syncs dominate. This engine runs the WHOLE epoch as one XLA
program: device-side shuffling, batching via `lax.scan`, the SpJoin, the
model, the optimizer, and the epoch ROC-AUC — the host pulls two scalars
per epoch.

Evaluation likewise: batched scoring under `lax.scan`, Hits@K / MRR / AUC
computed on device (sort-based, scatter-free).
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from surel_plus_tpu.ops.join import gather_join
from surel_plus_tpu.ops.walk import rows_searchsorted
from surel_plus_tpu.spg.spg import SpGDevice
from surel_plus_tpu.train.loop import TrainConfig


def _ordered_float_key(x: jax.Array) -> jax.Array:
    """Bitcast float32 -> uint32 preserving total order (so the exclusive
    upper bound is key+1 exactly — float `nextafter` is unusable on TPU,
    which flushes denormals to zero)."""
    u = jax.lax.bitcast_convert_type(x.astype(jnp.float32), jnp.uint32)
    mask = jnp.where(u >> 31 == 1, jnp.uint32(0xFFFFFFFF),
                     jnp.uint32(0x80000000))
    return u ^ mask


def riffle_permutation(key: jax.Array, rows: int, cols: int,
                       rounds: int = 2) -> jax.Array:
    """Pseudorandom permutation of [0, rows*cols) as a [rows, cols] batch
    matrix, built from row-wise and column-wise key sorts only (1-D sorts
    serialize on TPU). Two riffle rounds mix thoroughly; this replaces
    `jax.random.permutation` for epoch shuffling (divergence from the
    reference's uniform shuffle: batch composition is pseudorandom rather
    than uniformly random — gradient-equivalent for SGD purposes)."""
    idx = jnp.arange(rows * cols, dtype=jnp.int32).reshape(rows, cols)
    for _ in range(rounds):
        key, k1, k2 = jax.random.split(key, 3)
        rk = jax.random.bits(k1, (rows, cols), dtype=jnp.uint32)
        _, idx = jax.lax.sort((rk, idx), dimension=1, num_keys=1)
        ck = jax.random.bits(k2, (rows, cols), dtype=jnp.uint32)
        _, idx = jax.lax.sort((ck, idx), dimension=0, num_keys=1)
    return idx


def device_auc_hist(pos_hist: jax.Array, neg_hist: jax.Array) -> jax.Array:
    """AUC from per-bin positive/negative score histograms (trapezoidal /
    midrank-within-bin). Used for the epoch training AUC — sort-free;
    accuracy ~1/(2*bins). Evaluation metrics use the exact device_auc."""
    n_pos = pos_hist.sum()
    n_neg = neg_hist.sum()
    neg_below = jnp.cumsum(neg_hist) - neg_hist
    wins = (pos_hist * (neg_below + 0.5 * neg_hist)).sum()
    return wins / jnp.maximum(n_pos * n_neg, 1.0)


def score_histogram(scores: jax.Array, weights: jax.Array,
                    bins: int) -> jax.Array:
    """Weighted histogram of sigmoid scores in [0, 1] via broadcast
    comparisons (no scatter)."""
    b = jnp.clip((scores * bins).astype(jnp.int32), 0, bins - 1)
    onehot = (b[:, None] == jnp.arange(bins, dtype=jnp.int32)[None, :])
    return (onehot * weights[:, None]).sum(axis=0)


def device_auc(labels: jax.Array, scores: jax.Array,
               weights: Optional[jax.Array] = None) -> jax.Array:
    """ROC-AUC with midrank tie handling, fully on device.

    Equivalent to sklearn.roc_auc_score for binary labels (the reference's
    epoch metric, train.py:139).
    """
    if weights is None:
        weights = jnp.ones_like(scores)
    # order-preserving integer keys; excluded entries forced to the bottom
    # and corrected out of the ranks afterwards
    keys = jnp.where(weights > 0, _ordered_float_key(scores), jnp.uint32(0))
    k_sorted = jnp.sort(keys)
    n_excl = (weights <= 0).sum()
    lb = rows_searchsorted(k_sorted[None, :], keys[None, :])[0]
    ub = rows_searchsorted(k_sorted[None, :], (keys + 1)[None, :])[0]
    midrank = (lb + ub + 1).astype(jnp.float32) / 2.0 - n_excl
    w = weights > 0
    is_pos = (labels > 0.5) & w
    is_neg = (labels <= 0.5) & w
    n_pos = is_pos.sum().astype(jnp.float32)
    n_neg = is_neg.sum().astype(jnp.float32)
    r_pos = jnp.where(is_pos, midrank, 0.0).sum()
    return (r_pos - n_pos * (n_pos + 1) / 2.0) / jnp.maximum(
        n_pos * n_neg, 1.0)


def device_hits_at_k(pos: jax.Array, neg: jax.Array, k: int) -> jax.Array:
    kth = jnp.sort(neg)[-k] if neg.shape[0] >= k else jnp.finfo(
        pos.dtype).min
    return (pos > kth).mean()


def device_mrr(pos: jax.Array, neg: jax.Array) -> jax.Array:
    """pos [n], neg [n, k]; optimistic-tie OGB ranks."""
    rank = 1 + (neg >= pos[:, None]).sum(axis=1)
    return (1.0 / rank).mean()


class DeviceTrainer:
    """One-XLA-program epochs over a device-resident SpG."""

    def __init__(self, model, dev: SpGDevice, config: TrainConfig,
                 join_fn: Callable = gather_join,
                 feature: Optional[jax.Array] = None,
                 train_embed_mode: str = "direct"):
        self.model = model  # used for scoring (table mode by default)
        # training uses the scatter-free backward unless told otherwise;
        # the parameter tree is identical across modes
        if hasattr(model, "embed_mode") and \
                model.embed_mode != train_embed_mode:
            self.train_model = model.clone(embed_mode=train_embed_mode)
        else:
            self.train_model = model
        self.dev = dev
        self.config = config
        self.join_fn = join_fn
        self.feature = feature
        # SpG arrays are passed to every jitted program as ARGUMENTS —
        # closure capture would embed hundreds of MB as HLO constants
        # (which also breaks remote-compile transports).
        self.sarr = (dev.nodes, dev.eidx, dev.sizes, dev.enc)
        self._join2 = lambda s, e: join_fn(s[0], s[1], s[2], e)
        self._enc_of = lambda s: s[3]
        # truncate SpG row tiles to a width class (balanced-|S_Q| batching,
        # paper §3.3): rows hold only `size` valid slots, so slicing to
        # L >= max batch size is lossless; XLA fuses slice-of-gather.
        self._slice_sarr = lambda s, L: (s[0][:, :L], s[1][:, :L], s[2],
                                         s[3])
        self._sizes_of = lambda s: s[2]
        self.optimizer = optax.chain(
            optax.clip_by_global_norm(config.grad_clip),
            optax.adam(config.lr),
        )
        self._epoch_cache = {}
        self._score_cache = {}
        self._init_fn = None

    def init(self, rng: jax.Array, example_edges) -> Tuple:
        edges = jnp.asarray(example_edges)
        join2, enc_of, model = self._join2, self._enc_of, self.model

        if self._init_fn is None:
            @jax.jit
            def _init(rng, sarr, feature, edges):
                joined = join2(sarr, edges)
                feat = feature[edges] if feature is not None else None
                return model.init(rng, enc_of(sarr), joined, feat)

            self._init_fn = _init
        params = self._init_fn(rng, self.sarr, self.feature, edges)
        return params, self.optimizer.init(params)

    # ------------------------------------------------------------------
    def _epoch_body(self, num_edges: int):
        """Traceable single-epoch body shared by the per-epoch and
        multi-epoch programs."""
        bs = self.config.batch_size
        nsteps = (num_edges + bs - 1) // bs
        model, opt = self.train_model, self.optimizer
        join2, enc_of = self._join2, self._enc_of

        auc_bins = 512

        def epoch(params, opt_state, sarr, feature, edges, labels, key):
            kperm, kdrop = jax.random.split(key)
            # pseudorandom batches via riffle shuffle (sort-free on the
            # flat axis); padded ids (>= num_edges) carry weight 0
            perm = riffle_permutation(kperm, nsteps, bs)
            wmat = (perm < num_edges).astype(jnp.float32)
            perm = jnp.minimum(perm, num_edges - 1)

            def step(carry, xs):
                params, opt_state, key, pos_h, neg_h = carry
                idx, w = xs
                be = edges[:, idx]
                bl = labels[idx]
                key, sub = jax.random.split(key)
                joined = join2(sarr, be)
                feat = feature[be] if feature is not None else None

                def loss_fn(p):
                    logits = model.apply(p, enc_of(sarr), joined, feat,
                                         train=True, rngs={"dropout": sub})
                    per = optax.sigmoid_binary_cross_entropy(logits, bl)
                    return (per * w).sum() / jnp.maximum(w.sum(), 1.0), \
                        logits

                (loss, logits), grads = jax.value_and_grad(
                    loss_fn, has_aux=True)(params)
                updates, opt_state = opt.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                preds = jax.nn.sigmoid(logits)
                # accumulate the epoch AUC as score histograms (sort-free)
                pos_h = pos_h + score_histogram(preds, w * bl, auc_bins)
                neg_h = neg_h + score_histogram(preds, w * (1.0 - bl),
                                                auc_bins)
                return (params, opt_state, key, pos_h, neg_h), \
                    (loss * w.sum(), w.sum())

            hist0 = jnp.zeros((auc_bins,), jnp.float32)
            (params, opt_state, _, pos_h, neg_h), (losses, counts) = \
                jax.lax.scan(step, (params, opt_state, kdrop, hist0, hist0),
                             (perm, wmat))
            mean_loss = losses.sum() / jnp.maximum(counts.sum(), 1.0)
            auc = device_auc_hist(pos_h, neg_h)
            return params, opt_state, mean_loss, auc

        return epoch

    def _epoch_fn(self, num_edges: int):
        if num_edges not in self._epoch_cache:
            self._epoch_cache[num_edges] = jax.jit(
                self._epoch_body(num_edges))
        return self._epoch_cache[num_edges]

    def train_epoch(self, params, opt_state, edges_dev, labels_dev,
                    key) -> Tuple:
        """edges_dev: [Q, E] int32 on device; labels_dev: [E] float32.
        Returns (params, opt_state, loss, auc) — loss/auc still device
        scalars (pull lazily)."""
        fn = self._epoch_fn(edges_dev.shape[1])
        return fn(params, opt_state, self.sarr, self.feature, edges_dev,
                  labels_dev, key)

    def _fit_fn(self, num_edges: int, n_epochs: int):
        key_c = (num_edges, n_epochs)
        if key_c in self._epoch_cache:
            return self._epoch_cache[key_c]
        body = self._epoch_body(num_edges)

        @jax.jit
        def fit(params, opt_state, sarr, feature, edges, labels, key):
            def one(carry, ekey):
                params, opt_state = carry
                params, opt_state, loss, auc = body(
                    params, opt_state, sarr, feature, edges, labels, ekey)
                return (params, opt_state), (loss, auc)

            keys = jax.random.split(key, n_epochs)
            (params, opt_state), (losses, aucs) = jax.lax.scan(
                one, (params, opt_state), keys)
            return params, opt_state, losses, aucs

        self._epoch_cache[key_c] = fit
        return fit

    def fit(self, params, opt_state, edges_dev, labels_dev, key,
            n_epochs: int):
        """Run n_epochs as ONE device program (amortizes dispatch latency
        on high-latency links). Returns (params, opt_state,
        losses [n_epochs], aucs [n_epochs])."""
        fn = self._fit_fn(edges_dev.shape[1], n_epochs)
        return fn(params, opt_state, self.sarr, self.feature, edges_dev,
                  labels_dev, key)

    # ------------------------------------------------------------------
    # Balanced-|S_Q| batching (paper §3.3): group queries by the tile
    # width they actually need — max endpoint set size rounded up to a
    # width class — so small-set queries stop paying the full `bucket`
    # padding in the join sorts. The reference gets its balance implicitly
    # from CSR's Sigma-nnz layout (train.py:20-30); here classes map to a
    # few static shapes, one scan per class inside one XLA program.
    # ------------------------------------------------------------------
    def partition_by_width(self, edges: np.ndarray, classes):
        """Host-side partition of [Q, E] queries into width classes.

        Returns list of (width, idx ndarray) covering all queries; classes
        must be ascending and end with a width >= the SpG bucket."""
        sizes_h = self._sizes_host()
        req = sizes_h[np.asarray(edges)].max(axis=0)  # [E]
        out = []
        prev = 0
        for L in classes:
            sel = np.nonzero((req > prev) & (req <= L))[0]
            out.append((int(L), sel))
            prev = L
        assert prev >= req.max(), (prev, int(req.max()))
        return out

    def _sizes_host(self) -> np.ndarray:
        if not hasattr(self, "_sizes_h"):
            self._sizes_h = np.asarray(self._sizes_of(self.sarr))
        return self._sizes_h

    def _fit_balanced_fn(self, counts, widths, n_epochs: int):
        key_c = ("bal", tuple(counts), tuple(widths), n_epochs)
        if key_c in self._epoch_cache:
            return self._epoch_cache[key_c]
        bs = self.config.batch_size
        model, opt = self.train_model, self.optimizer
        join2, enc_of, slice_sarr = self._join2, self._enc_of, \
            self._slice_sarr
        feature_present = self.feature is not None
        auc_bins = 512
        nsteps_c = [(n + bs - 1) // bs for n in counts]

        def epoch(params, opt_state, sarr, feature, class_edges,
                  class_labels, key):
            hist0 = jnp.zeros((auc_bins,), jnp.float32)
            pos_h = neg_h = hist0
            loss_sum = jnp.zeros(())
            w_sum = jnp.zeros(())
            kdrop = key
            for ci, (n_c, L_c) in enumerate(zip(counts, widths)):
                if n_c == 0:
                    continue
                edges_c = class_edges[ci]
                labels_c = class_labels[ci]
                sarr_c = slice_sarr(sarr, L_c)
                kperm = jax.random.fold_in(key, ci)
                perm = riffle_permutation(kperm, nsteps_c[ci], bs)
                wmat = (perm < n_c).astype(jnp.float32)
                perm = jnp.minimum(perm, n_c - 1)

                def step(carry, xs, edges_c=edges_c, labels_c=labels_c,
                         sarr_c=sarr_c):
                    params, opt_state, key, pos_h, neg_h, loss_sum, \
                        w_sum = carry
                    idx, w = xs
                    be = edges_c[:, idx]
                    bl = labels_c[idx]
                    key, sub = jax.random.split(key)
                    joined = join2(sarr_c, be)
                    feat = feature[be] if feature_present else None

                    def loss_fn(p):
                        logits = model.apply(
                            p, enc_of(sarr_c), joined, feat, train=True,
                            rngs={"dropout": sub})
                        per = optax.sigmoid_binary_cross_entropy(logits, bl)
                        return (per * w).sum() / jnp.maximum(w.sum(), 1.0), \
                            logits

                    (loss, logits), grads = jax.value_and_grad(
                        loss_fn, has_aux=True)(params)
                    updates, opt_state = opt.update(grads, opt_state,
                                                    params)
                    params = optax.apply_updates(params, updates)
                    preds = jax.nn.sigmoid(logits)
                    pos_h = pos_h + score_histogram(preds, w * bl, auc_bins)
                    neg_h = neg_h + score_histogram(preds, w * (1.0 - bl),
                                                    auc_bins)
                    return (params, opt_state, key, pos_h, neg_h,
                            loss_sum + loss * w.sum(), w_sum + w.sum()), None

                (params, opt_state, kdrop, pos_h, neg_h, loss_sum,
                 w_sum), _ = jax.lax.scan(
                    step, (params, opt_state, kdrop, pos_h, neg_h,
                           loss_sum, w_sum), (perm, wmat))
            mean_loss = loss_sum / jnp.maximum(w_sum, 1.0)
            auc = device_auc_hist(pos_h, neg_h)
            return params, opt_state, mean_loss, auc

        @jax.jit
        def fit(params, opt_state, sarr, feature, class_edges,
                class_labels, key):
            def one(carry, ekey):
                params, opt_state = carry
                params, opt_state, loss, auc = epoch(
                    params, opt_state, sarr, feature, class_edges,
                    class_labels, ekey)
                return (params, opt_state), (loss, auc)

            keys = jax.random.split(key, n_epochs)
            (params, opt_state), (losses, aucs) = jax.lax.scan(
                one, (params, opt_state), keys)
            return params, opt_state, losses, aucs

        self._epoch_cache[key_c] = fit
        return fit

    def fit_balanced(self, params, opt_state, edges: np.ndarray,
                     labels: np.ndarray, key, n_epochs: int, classes):
        """Width-classed multi-epoch fit. `edges` [Q, E] / `labels` [E]
        host arrays; `classes` ascending tile widths, last >= bucket.
        Returns (params, opt_state, losses, aucs, groups) where groups is
        the partition (for waste diagnostics)."""
        bs = self.config.batch_size
        groups = self.partition_by_width(edges, classes)
        class_edges, class_labels, counts, widths = [], [], [], []
        for L, sel in groups:
            n_c = len(sel)
            counts.append(n_c)
            widths.append(L)
            if n_c == 0:
                class_edges.append(
                    jnp.zeros((edges.shape[0], bs), jnp.int32))
                class_labels.append(jnp.zeros((bs,), jnp.float32))
                continue
            pad = (-n_c) % bs
            e_c = np.asarray(edges)[:, sel]
            l_c = np.asarray(labels)[sel]
            if pad:
                e_c = np.concatenate(
                    [e_c, np.zeros((e_c.shape[0], pad), e_c.dtype)], axis=1)
                l_c = np.concatenate([l_c, np.zeros(pad, l_c.dtype)])
            class_edges.append(jnp.asarray(e_c))
            class_labels.append(jnp.asarray(l_c))
        fn = self._fit_balanced_fn(tuple(counts), tuple(widths), n_epochs)
        params, opt_state, losses, aucs = fn(
            params, opt_state, self.sarr, self.feature,
            tuple(class_edges), tuple(class_labels), key)
        return params, opt_state, losses, aucs, groups

    def predict_balanced(self, params, edges: np.ndarray,
                         classes) -> jax.Array:
        """Width-classed scoring: each class scored at its own tile width,
        results restored to input order. Exactly equals `predict`."""
        groups = self.partition_by_width(edges, classes)
        E = edges.shape[1]
        out = jnp.zeros((E,), jnp.float32)
        for L, sel in groups:
            if len(sel) == 0:
                continue
            scores = self._predict_width(params, np.asarray(edges)[:, sel],
                                         int(L))
            out = out.at[jnp.asarray(sel)].set(scores)
        return out

    def _predict_width(self, params, edges: np.ndarray, L: int):
        bs = self.config.batch_size
        E = edges.shape[1]
        pad = (-E) % bs
        if pad:
            edges = np.concatenate(
                [edges, np.zeros((edges.shape[0], pad), edges.dtype)],
                axis=1)
        fn = self._score_width_fn(E + pad, L)
        return fn(params, self.sarr, self.feature, jnp.asarray(edges))[:E]

    def _score_width_fn(self, num_padded: int, L: int):
        key_c = ("score", num_padded, L)
        if key_c in self._score_cache:
            return self._score_cache[key_c]
        bs = self.config.batch_size
        nsteps = num_padded // bs
        model = self.model
        join2, enc_of, slice_sarr = self._join2, self._enc_of, \
            self._slice_sarr

        @jax.jit
        def score(params, sarr, feature, edges):
            sarr_c = slice_sarr(sarr, L)

            def step(_, i):
                be = jax.lax.dynamic_slice_in_dim(edges, i * bs, bs, axis=1)
                joined = join2(sarr_c, be)
                feat = feature[be] if feature is not None else None
                logits = model.apply(params, enc_of(sarr_c), joined, feat,
                                     train=False)
                return None, jax.nn.sigmoid(logits)

            _, out = jax.lax.scan(step, None,
                                  jnp.arange(nsteps, dtype=jnp.int32))
            return out.reshape(-1)

        self._score_cache[key_c] = score
        return score

    # ------------------------------------------------------------------
    def _score_fn(self, num_padded: int):
        if num_padded in self._score_cache:
            return self._score_cache[num_padded]
        bs = self.config.batch_size
        assert num_padded % bs == 0
        nsteps = num_padded // bs
        model = self.model
        join2, enc_of = self._join2, self._enc_of

        @jax.jit
        def score(params, sarr, feature, edges):
            def step(_, i):
                be = jax.lax.dynamic_slice_in_dim(edges, i * bs, bs, axis=1)
                joined = join2(sarr, be)
                feat = feature[be] if feature is not None else None
                logits = model.apply(params, enc_of(sarr), joined, feat,
                                     train=False)
                return None, jax.nn.sigmoid(logits)

            _, out = jax.lax.scan(step, None,
                                  jnp.arange(nsteps, dtype=jnp.int32))
            return out.reshape(-1)

        self._score_cache[num_padded] = score
        return score

    def predict(self, params, edges: np.ndarray) -> jax.Array:
        """Score [Q, E] query edges; returns device scores [E]."""
        bs = self.config.batch_size
        E = edges.shape[1]
        pad = (-E) % bs
        if pad:
            edges = np.concatenate(
                [edges, np.zeros((edges.shape[0], pad), edges.dtype)],
                axis=1)
        scores = self._score_fn(E + pad)(params, self.sarr, self.feature,
                                         jnp.asarray(edges))
        return scores[:E]


def trainer_from_keys(model, spgk, config: TrainConfig,
                      feature=None, join_factory=None,
                      train_embed_mode: str = "table") -> DeviceTrainer:
    """DeviceTrainer over a packed-key SpG (SpGKeys): the join unpacks
    landing-count features on the fly, no dedup/table stage.
    `join_factory(num_walks, num_steps)` defaults to the 2-endpoint link
    join; pass ops.join.make_keys_hjoin for 3-node hyperedge queries.

    On the float-feature path, embed_mode='table' means a plain
    (non-remat) pe MLP — measured fastest (177k vs 143k q/s at bs=4096;
    activations ~4 GB bf16 fit HBM); pass 'direct' to remat when memory
    is tight (bigger batches / hidden sizes)."""
    from surel_plus_tpu.ops.join import make_keys_join

    if join_factory is None:
        join_factory = make_keys_join
    join = join_factory(spgk.num_walks, spgk.num_steps)
    # static key layout lets the model fuse unpack+hidden+sum in Pallas
    if getattr(model, "key_layout", False) is None:
        model = model.clone(
            key_layout=(spgk.num_walks, spgk.num_steps))

    dev = SpGDevice(nodes=spgk.nodes, eidx=spgk.nodes, sizes=spgk.sizes,
                    enc=jnp.zeros((1, 1), jnp.float32))
    tr = DeviceTrainer(model, dev, config, feature=feature,
                       train_embed_mode=train_embed_mode)
    # override the argument pytree and join to carry the packed keys
    tr.sarr = (spgk.nodes, spgk.khi, spgk.klo, spgk.sizes)
    tr._join2 = lambda s, e: join(s[0], s[1], s[2], s[3], e)
    tr._enc_of = lambda s: jnp.zeros((1, 1), jnp.float32)
    tr._slice_sarr = lambda s, L: (s[0][:, :L], s[1][:, :L], s[2][:, :L],
                                   s[3])
    tr._sizes_of = lambda s: s[3]
    return tr


def evaluate_device(trainer: DeviceTrainer, params, inf_edge,
                    metric: str):
    """Device-metric version of train.loop.evaluate — same result shapes
    (reference train.py:175-280), host pulls only final scalars."""
    import time

    def split_scores(split):
        pos_edge, neg_edge = inf_edge[split]
        return (trainer.predict(params, pos_edge),
                trainer.predict(params, neg_edge))

    pos_v, neg_v = split_scores("valid")
    t0 = time.time()
    pos_t, neg_t = split_scores("test")

    if "Hits" in metric:
        results = {}
        for k in (10, 20, 50, 100):
            results[f"Hits@{k}"] = (
                0,
                float(device_hits_at_k(pos_v, neg_v, k)),
                float(device_hits_at_k(pos_t, neg_t, k)),
            )
        return results, time.time() - t0
    if "AUC" in metric:
        def auc(pos, neg):
            labels = jnp.concatenate(
                [jnp.ones(pos.shape[0]), jnp.zeros(neg.shape[0])])
            return float(device_auc(labels, jnp.concatenate([pos, neg])))
        return (0, auc(pos_v, neg_v), auc(pos_t, neg_t)), time.time() - t0
    k_v = neg_v.shape[0] // max(pos_v.shape[0], 1)
    k_t = neg_t.shape[0] // max(pos_t.shape[0], 1)
    return (0,
            float(device_mrr(pos_v,
                             neg_v[:pos_v.shape[0] * k_v].reshape(-1, k_v))),
            float(device_mrr(pos_t,
                             neg_t[:pos_t.shape[0] * k_t].reshape(-1, k_t))),
            ), time.time() - t0
