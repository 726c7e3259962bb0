"""Higher-order pattern model (reference model_horder.py:42-66, `HONet`).

Scores 3-node queries (u, v, w) from four joined segment groups
(u|w, w|u, v|w, w|v) produced by `hgather_join`: pe-embed + pair-sum,
mean-pool each group (torch_scatter.scatter_mean in the reference), then a
4-way MergeLayer. The reference also constructs a LayerNorm (`concat_norm`,
model_horder.py:53) that its forward never uses; we omit it.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax

from surel_plus_tpu.models.layers import MergeLayer, MLP2, masked_mean
from surel_plus_tpu.ops.join import JoinedBatch
from surel_plus_tpu.ops.pallas.hidden_sum_kernel import (
    NEG,
    fused_key_hidden_sum_split,
    set_sum_splits,
    u_core_rows,
)


class HONet(nn.Module):
    input_dim: int
    hidden_dim: int = 96
    out_dim: int = 1
    x_dim: int = 0
    dropout: float = 0.1
    # Pallas fused key-unpack+hidden+set-sum over the hjoin's four
    # groups (same kernel as models/net.py — the two merges' cross
    # planes ride side by side in one [B, 4L] plane). None = auto.
    fused_hidden: Optional[bool] = None
    key_layout: Optional[Tuple[int, int]] = None

    @nn.compact
    def __call__(self, enc_table: jax.Array, joined: JoinedBatch,
                 feature=None, *, train: bool = False) -> jax.Array:
        """joined.eidx: [4, B, L, 2]; returns logits [B]."""
        import jax.numpy as jnp

        pe = MLP2(self.hidden_dim, self.hidden_dim, name="pe_embedding")
        fuse = self.fused_hidden
        if fuse is None:
            fuse = jax.default_backend() == "tpu"
        if (fuse and joined.kown is not None
                and joined.kcross_mask is not None
                and self.key_layout is not None):
            nw, ns = self.key_layout
            w1, b1 = pe.hidden_raw(ns + 1)
            u = u_core_rows(w1, nw, ns)
            u_ext = jnp.concatenate(
                [u, jnp.full((1, self.hidden_dim), NEG, jnp.float32),
                 b1.astype(jnp.float32)[None]], axis=0)
            # four hyperedge groups at large L blow the kernel's scoped
            # VMEM in one q=4 pass (fwd 18.04 MB, bwd 27.40 MB measured
            # on v5e at M=200). The hjoin's cross plane is two merges
            # side by side — groups (0,1) only read the first [B, 2L]
            # half, (2,3) the second (join_gathered_hkeys) — so split
            # along the GROUP axis into two q=2 calls at the exact
            # monolithic shape hardware validates fused+fast (VERDICT
            # r3 item 4; the slot-range split alternative measured
            # x0.77 vs XLA at nsplit=4, probe_honet_hw). Each q=2 part
            # still slot-splits if a yet-wider shape demands it.
            kown, mask = joined.kown, joined.mask
            kcross, kcmask = joined.kcross, joined.kcross_mask
            half = kcross.shape[-1] // 2
            nsplit = set_sum_splits(kown.shape[-1], half,
                                    self.hidden_dim, q=2)
            shift = int(nw).bit_length()
            parts = []
            for g0, g1, c0, c1 in ((0, 2, 0, half),
                                   (2, 4, half, 2 * half)):
                parts.append(fused_key_hidden_sum_split(
                    kown[g0:g1], mask[g0:g1], kcross[:, c0:c1],
                    kcmask[g0:g1, :, c0:c1], u_ext, shift, nsplit,
                    root_own=(None if joined.kown_root is None
                              else joined.kown_root[g0:g1]),
                    root_cross=(None if joined.kcross_root is None
                                else joined.kcross_root[:, c0:c1])))
            sums = jnp.concatenate(parts, axis=0)      # [4, B, h]
            cnt = jnp.maximum(joined.mask.sum(axis=-1), 1)
            mean = sums / cnt[..., None].astype(jnp.float32)
            b2v = pe.project(jnp.zeros((1, self.hidden_dim), jnp.float32))
            agg = pe.project(mean) + b2v                    # [4, B, h]
        else:
            # aggregate-before-project (see models/net.py): mean-pool
            # the hidden activations, project the [4, B, h] aggregate
            if jnp.issubdtype(joined.eidx.dtype, jnp.integer):
                htable = pe.hidden(enc_table)
                hpair = htable[joined.eidx]    # [4, B, L, 2, h]
            else:
                # packed-key path: feature pairs [4, B, L, 2, ncol]
                hpair = pe.hidden(joined.eidx)
            hsum = hpair.sum(axis=-2)          # [4, B, L, h]
            b2v = pe.project(jnp.zeros((1, self.hidden_dim), hsum.dtype))
            agg = pe.project(masked_mean(hsum, joined.mask)) + b2v
        score = MergeLayer(self.hidden_dim, self.out_dim, self.dropout,
                           name="affinity_score")(
            [agg[0], agg[1], agg[2], agg[3]], train=train)
        return score.squeeze(-1)
