"""Higher-order pattern model (reference model_horder.py:42-66, `HONet`).

Scores 3-node queries (u, v, w) from four joined segment groups
(u|w, w|u, v|w, w|v) produced by `hgather_join`: pe-embed + pair-sum,
mean-pool each group (torch_scatter.scatter_mean in the reference), then a
4-way MergeLayer. The reference also constructs a LayerNorm (`concat_norm`,
model_horder.py:53) that its forward never uses; we omit it.
"""

from __future__ import annotations

import flax.linen as nn
import jax

from surel_plus_tpu.models.layers import MergeLayer, MLP2, masked_mean
from surel_plus_tpu.ops.join import JoinedBatch


class HONet(nn.Module):
    input_dim: int
    hidden_dim: int = 96
    out_dim: int = 1
    x_dim: int = 0
    dropout: float = 0.1

    @nn.compact
    def __call__(self, enc_table: jax.Array, joined: JoinedBatch,
                 feature=None, *, train: bool = False) -> jax.Array:
        """joined.eidx: [4, B, L, 2]; returns logits [B]."""
        import jax.numpy as jnp

        pe = MLP2(self.hidden_dim, self.hidden_dim, name="pe_embedding")
        # aggregate-before-project (see models/net.py): mean-pool the
        # hidden activations, project the [4, B, h] aggregate once
        if jnp.issubdtype(joined.eidx.dtype, jnp.integer):
            htable = pe.hidden(enc_table)
            hpair = htable[joined.eidx]    # [4, B, L, 2, h]
        else:
            # packed-key path: unpacked feature pairs [4, B, L, 2, ncol]
            hpair = pe.hidden(joined.eidx)
        hsum = hpair.sum(axis=-2)          # [4, B, L, h]
        b2v = pe.project(jnp.zeros((1, self.hidden_dim), hsum.dtype))
        agg = pe.project(masked_mean(hsum, joined.mask)) + b2v  # [4, B, h]
        score = MergeLayer(self.hidden_dim, self.out_dim, self.dropout,
                           name="affinity_score")(
            [agg[0], agg[1], agg[2], agg[3]], train=train)
        return score.squeeze(-1)
