"""Link-prediction set encoder (reference model.py:45-104, `Net`).

Pipeline: structural encodings -> pe_embedding MLP -> pair-sum join ->
masked set aggregation (mean / lstm / attn) -> optional raw-feature branch ->
MergeLayer scorer.

TPU rewrite of the hot path: the reference applies `pe_embedding` to every
(set-element, pair-side) encoding row in the batch — O(sum |S| * 2) MLP
evaluations (model.py:78). Because `pe_embedding(x).sum(dim=-2)` distributes
over the pair, we embed the deduped encoding table once (U rows, typically
100-1000x smaller after SUREL+'s compression) and reduce the join to two
gathers and an add. Backward flows through the gathers as segment-sums —
all XLA-native.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from surel_plus_tpu.models.layers import (
    AttentionAggregation,
    LSTMAggregation,
    MergeLayer,
    MLP2,
    masked_mean,
)
from surel_plus_tpu.ops.join import JoinedBatch
from surel_plus_tpu.ops.pallas.hidden_sum_kernel import (
    NEG,
    attn_pool_chunk,
    fused_key_hidden_sum_split,
    set_sum_splits,
    u_core_rows,
)


class Net(nn.Module):
    input_dim: int          # encoding columns (CLI num_steps)
    hidden_dim: int = 96
    out_dim: int = 1
    x_dim: int = 0
    dropout: float = 0.1
    use_feature: bool = False
    aggrs: str = "mean"     # mean | lstm | attn
    # 'table': embed the unique encoding table once, join via gathers —
    #   cheapest forward, but the backward is an embedding scatter-add.
    # 'direct': apply the MLP's hidden layer to gathered rows — more MXU
    #   FLOPs, zero scatters in the backward (enc is a constant). Same
    #   parameter tree; pick per-phase (train: direct, inference: table).
    embed_mode: str = "table"
    # compute precision for the hot layers; params stay float32
    dtype: str = "float32"
    # Pallas fused key-unpack+hidden+mask+set-sum for the mean aggregator
    # over packed-key joins (the row activations never touch HBM; backward
    # recomputes them from the 32x-smaller keys —
    # ops/pallas/hidden_sum_kernel.py). Needs key_layout =
    # (num_walks, num_steps) — trainer_from_keys fills it in. None = auto:
    # on for TPU, off elsewhere (CPU runs it in slow interpret mode).
    fused_hidden: Optional[bool] = None
    key_layout: Optional[Tuple[int, int]] = None

    @nn.compact
    def __call__(self, enc_table: jax.Array, joined: JoinedBatch,
                 feature: Optional[jax.Array] = None, *,
                 train: bool = False) -> jax.Array:
        """enc_table: float [U+1, input_dim] normalized encodings, row 0 = 0.
        joined: JoinedBatch with eidx [2, B, L, 2], mask [2, B, L].
        feature: optional raw features [2, B, x_dim].
        Returns logits [B]."""
        cdtype = jnp.dtype(self.dtype)
        pe = MLP2(self.hidden_dim, self.hidden_dim, dtype=cdtype,
                  name="pe_embedding")
        # Aggregate-before-project: every path below computes only the
        # HIDDEN activations per (slot, pair-side), sums over the pair
        # axis, and defers pe's second (linear) layer until after as much
        # reduction as possible — sums/means commute with it, so
        #   masked_mean(pe(e).sum(-2)) == pe.project(masked_mean(hsum)) + b2
        # (each valid slot carries exactly two bias terms; `b2v` restores
        # the second one). The reference projects every slot
        # (model.py:78); on TPU that materializes a [2, B, L, 2, h]
        # activation that is pure HBM traffic — the aggregate form writes
        # [2, B, L, h] once (hidden) and projects [2, B, h].
        xrows = None  # pre-hidden rows [2, B, L, 2, C] when materialized
        if jnp.issubdtype(joined.eidx.dtype, jnp.integer):
            if self.embed_mode == "direct":
                xrows = enc_table[joined.eidx]             # [2, B, L, 2, C]
        elif joined.eidx.ndim == 5:
            # packed-key path: joined.eidx carries unpacked encoding
            # feature pairs [2, B, L, 2, ncol] (join.py:make_keys_join).
            xrows = joined.eidx
        else:
            # scalar metric path (PPR/SPD/DEG, encode=None in train.py:39-43):
            # joined.eidx carries float value pairs [2, B, L, 2].
            xrows = joined.eidx[..., None]

        fuse = self.fused_hidden
        if fuse is None:
            fuse = jax.default_backend() == "tpu"
        if (fuse and self.aggrs == "mean" and joined.kown is not None
                and joined.kcross_mask is not None
                and self.key_layout is not None):
            # Fused path: one Pallas pass per batch computes
            #   sum_l mask[l] * (relu(f(kown[l]) W1 + b1)
            #                  + relu(f(kcross[l]) W1 + b1))
            # from the PACKED keys — unpack + first matmul collapse into
            # fields(k)^T @ U with U = permuted/scaled W1 rows, nothing
            # row-sized touches HBM, and the backward recomputes
            # activations from the keys.
            nw, ns = self.key_layout
            w1, b1 = pe.hidden_raw(ns + 1)
            u = u_core_rows(w1, nw, ns)                    # [ncol, h]
            # kernel compute stays f32: a bf16 variant measured no
            # faster (the z materialization dominates and stays f32)
            u_ext = jnp.concatenate(
                [u, jnp.full((1, self.hidden_dim), NEG, jnp.float32),
                 b1.astype(jnp.float32)[None]], axis=0)
            # huge-L configs would blow the kernel's scoped VMEM in one
            # pass; slot-range splitting keeps the fused path (set sums
            # are order-invariant, parts simply add)
            nsplit = set_sum_splits(joined.kown.shape[-1],
                                    joined.kcross.shape[-1],
                                    self.hidden_dim)
            sums = fused_key_hidden_sum_split(
                joined.kown, joined.mask, joined.kcross,
                joined.kcross_mask, u_ext, int(nw).bit_length(),
                nsplit,
                root_own=joined.kown_root,
                root_cross=joined.kcross_root)
            cnt = jnp.maximum(joined.mask.sum(axis=-1), 1)  # [Q, B]
            mean = (sums / cnt[..., None].astype(jnp.float32)
                    ).astype(cdtype)                       # [Q, B, h]
            b2v = pe.project(jnp.zeros((1, self.hidden_dim), cdtype))
            agg = pe.project(mean) + b2v
            return self._score(agg, feature, cdtype, train)

        # hsum below feeds the non-keys attn/lstm fallbacks; on the
        # fused keys paths (attn pool / keys-LSTM, which consume the
        # packed keys directly) it is only a shape/param template and
        # XLA dead-code-eliminates it. (ops/pallas fused_key_hidden_slots
        # remains available as a standalone per-slot primitive.)
        if xrows is not None:
            hpair = pe.hidden(xrows)                       # [2, B, L, 2, h]
        else:
            # LP path: embed unique encodings once; join == gather +
            # add (model.py:78's pe_embedding(x).sum(dim=-2),
            # algebraically rewritten over the deduped table).
            htable = pe.hidden(enc_table)                  # [U+1, h]
            hpair = htable[joined.eidx]                    # [2, B, L, 2, h]
        hsum = hpair.sum(axis=-2)                          # [2, B, L, h]
        b2v = pe.project(jnp.zeros((1, self.hidden_dim), hsum.dtype))

        if self.aggrs == "attn":
            aggr = AttentionAggregation(self.hidden_dim, name="aggr")
            if fuse:
                # fold the projection + value Dense past the softmax:
                # x = hsum @ W2 + 2*b2 (own+cross each carry one bias),
                # and only the scalar gate is computed per slot
                w2, bias2 = pe.project_raw()
                c2 = 2.0 * bias2.astype(jnp.float32)[None]
                if (joined.kown is not None
                        and joined.kcross_al is not None
                        and self.key_layout is not None):
                    # one Pallas pass keys -> pooled (custom VJP): the
                    # per-slot hidden rows never reach HBM in either
                    # direction (the hsum computed above goes dead and
                    # XLA removes its kernel call). Wide shapes where
                    # the monolithic working set would blow scoped VMEM
                    # (ppa's M=200: backward measured 22.51 MB) run the
                    # slot-chunked kernels instead of falling back to
                    # XLA — the fused path is always available here.
                    chunk = attn_pool_chunk(joined.kown.shape[-1],
                                            joined.kcross_al.shape[-1],
                                            self.hidden_dim)
                    nw, ns = self.key_layout
                    w1, b1 = pe.hidden_raw(ns + 1)
                    u_ext = jnp.concatenate(
                        [u_core_rows(w1, nw, ns),
                         jnp.full((1, self.hidden_dim), NEG,
                                  jnp.float32),
                         b1.astype(jnp.float32)[None]], axis=0)
                    agg = aggr.folded_from_keys(
                        joined.kown, joined.kcross_al, joined.mask,
                        u_ext, int(nw).bit_length(), w2, c2,
                        root_own=joined.kown_root,
                        root_cross=joined.kcross_al_root,
                        chunk=chunk)
                else:
                    agg = aggr.folded(hsum, joined.mask, w2, c2)
            else:
                x = pe.project(hsum) + b2v                 # [2, B, L, h]
                agg = aggr(x, joined.mask)
        elif self.aggrs == "lstm":
            aggr = LSTMAggregation(self.hidden_dim, name="aggr")
            if fuse:
                # fold the projection into the recurrence's input
                # weights (x = hsum @ W2 + 2*b2, see the attn branch)
                w2, bias2 = pe.project_raw()
                c2 = 2.0 * bias2.astype(jnp.float32)[None]
                keys = None
                if (joined.kown is not None
                        and joined.kcross_al is not None
                        and self.key_layout is not None):
                    # recurrence straight from the packed keys: the
                    # per-slot hsum above goes dead and XLA removes it
                    nw, ns = self.key_layout
                    w1, b1 = pe.hidden_raw(ns + 1)
                    u_ext = jnp.concatenate(
                        [u_core_rows(w1, nw, ns),
                         jnp.full((1, self.hidden_dim), NEG,
                                  jnp.float32),
                         b1.astype(jnp.float32)[None]], axis=0)
                    keys = (joined.kown, joined.kcross_al, joined.mask,
                            u_ext, int(nw).bit_length(),
                            joined.kown_root, joined.kcross_al_root)
                # keys path: transposed-layout kernel, fast in BOTH
                # phases (tb=128 fwd and BPTT). x-based fallback: the
                # flat kernel's backward is VMEM-bound (tb=16 starves
                # the MXU — measured 12.1k vs the scan's 15.6k q/s,
                # scripts/probe_fused_ab.py), so training without keys
                # uses the folded XLA scan instead.
                agg = aggr(hsum, joined.mask,
                           fast=keys is not None or not train,
                           fold=(w2, c2), keys=keys)
            else:
                x = pe.project(hsum) + b2v
                agg = aggr(x, joined.mask)
        elif self.aggrs == "mean":
            agg = pe.project(masked_mean(hsum, joined.mask)) + b2v
        else:
            raise ValueError(f"unknown aggregator {self.aggrs!r}")
        return self._score(agg, feature, cdtype, train)

    def _score(self, agg: jax.Array, feature: Optional[jax.Array],
               cdtype, train: bool) -> jax.Array:
        """Endpoint concat + optional raw-feature branch + MergeLayer."""
        agg = agg.astype(jnp.float32)
        xl, xr = agg[0], agg[1]                            # [B, h]

        if self.use_feature:
            if feature is None:
                raise ValueError("use_feature=True requires features")
            femb = MLP2(self.hidden_dim, self.hidden_dim, dtype=cdtype,
                        name="feature_embedding")(feature)  # [2, B, h]
            xl = jnp.concatenate([xl, femb[0].astype(jnp.float32)], axis=-1)
            xr = jnp.concatenate([xr, femb[1].astype(jnp.float32)], axis=-1)

        score = MergeLayer(self.hidden_dim, self.out_dim, self.dropout,
                           dtype=cdtype,
                           name="affinity_score")([xl, xr], train=train)
        return score.squeeze(-1)
