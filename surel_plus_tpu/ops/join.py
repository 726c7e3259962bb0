"""SpJoin: online sparse set join, TPU-native.

The reference realizes SpJoin as SciPy CSR row slicing + boolean-mask
multiply-add over 4 Python threads (train.py:13-45, 75-111): for a query
(u, v) it pairs, for every node x in S_u, the encoding index of x w.r.t. u
with the index w.r.t. v (or the zero row if x is not in S_v), and
symmetrically for S_v.

TPU design: SpG rows are fixed-width, node-id-sorted tiles, so the join is a
batched binary search (`searchsorted`) — one fused device op, no host
threads, no CSR masked-add. Output is a padded [B, L] index pair block per
side plus validity masks; downstream set aggregation consumes the mask
instead of CSR indptr segments.

A key algebraic rewrite the dense layout enables: the model applies
`pe_embedding(x).sum(dim=-2)` over the (left, right) encoding pair
(model.py:78). Since the sum distributes, embedding the *unique* encoding
table once per step and gathering rows replaces per-batch-element MLP
work with `embed[eidx_u] + embed[eidx_cross]` — see models/net.py.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from surel_plus_tpu.ops.walk import INT32_MAX


class JoinedBatch(NamedTuple):
    """Join output for a batch of B queries with Q endpoints each.

    eidx:  int32 [Q, B, L, 2] — encoding-table indices; [..., 0] is the
           anchor side (x's encoding w.r.t. the endpoint whose set x lies
           in), [..., 1] the cross side (0 if absent, selecting the zero
           encoding row — reproducing train.py:33-37's masked-add).
    mask:  bool  [Q, B, L]    — validity of each set slot.
    sizes: int32 [Q, B]       — true set sizes.
    kown/kcross: packed lo keys (uint32), set by the keys joins when the
           field layout fits the lo word — lane-dense duplicates of the
           information in eidx for the Pallas fused hidden kernel
           (models/net.py). kown is [Q, B, L] in original slot order
           (mask applies); kcross is ONE shared [B, 2L] plane in
           MERGED-SORT order holding every endpoint's matches at
           disjoint positions, selected per endpoint by kcross_mask
           [Q, B, 2L] — set sums are order-invariant, so the fused path
           consumes the merge output directly and XLA
           dead-code-eliminates the un-sort pass. Consumers that read
           eidx instead leave all three dead and XLA removes them.
    """

    eidx: jax.Array
    mask: jax.Array
    sizes: jax.Array
    kown: Optional[jax.Array] = None
    kcross: Optional[jax.Array] = None
    kcross_mask: Optional[jax.Array] = None
    # slot-ALIGNED cross keys [Q, B, L] (uint32) for per-slot fused
    # consumers (attn/lstm, models/net.py) — unlike kcross these come
    # from the un-sorted side, so using them keeps the un-sort alive.
    kcross_al: Optional[jax.Array] = None
    # Root-indicator planes (int32 0/1, same shapes as the key planes
    # above). Set only for "lead-in-hi" layouts (field counts fill the
    # lo word exactly and the root bit is the hi word's bit 0 — e.g.
    # S=4, M=200: ppa/tags-math): the kernels then take the root
    # feature from these planes instead of a key bit, derived from node
    # ids (a slot is the root iff its node IS the set's seed).
    kown_root: Optional[jax.Array] = None
    kcross_root: Optional[jax.Array] = None
    kcross_al_root: Optional[jax.Array] = None


def _cross_lookup_multi(nodes_a: jax.Array, nodes_b: jax.Array,
                        *payloads_b: jax.Array):
    """For each slot of row a, the payload(s) of that node in row b (0 if
    absent), via a sort-based merge join.

    Per-element gathers (binary search + take_along_axis) run near one
    element per cycle on TPU; sorts are lane-vectorized compare-exchange
    networks and ~50x faster at these shapes (measured: 277ms -> ~5ms per
    4096x301 join step). Two row-sorts: merge by (node, origin) — the b
    copy of a shared node id lands immediately left of the a copy — then
    un-sort by original position. Rows are ascending, unique, INT32_MAX
    padded.
    """
    B, L = nodes_a.shape
    zero_pays = [jnp.zeros((B, L), p.dtype) for p in payloads_b]
    # pack the origin tag into the node key's low bit (node ids are
    # < 2^31 so uint32 node<<1|tag is exact): ONE sort key and one fewer
    # operand — sort cost scales with both. For equal nodes the b copy
    # (tag 0) lands immediately left of the a copy (tag 1), as before.
    vals = jnp.concatenate([nodes_b, nodes_a], axis=1)       # [B, 2L]
    tag = jnp.concatenate([
        jnp.zeros((B, L), jnp.uint32), jnp.ones((B, L), jnp.uint32)],
        axis=1)
    packed = (vals.astype(jnp.uint32) << 1) | tag
    pays = [jnp.concatenate([p, z], axis=1)
            for p, z in zip(payloads_b, zero_pays)]
    pos = jnp.broadcast_to(jnp.arange(2 * L, dtype=jnp.int32)[None, :],
                           (B, 2 * L))
    sorted_ops = jax.lax.sort((packed, pos, *pays), num_keys=1)
    spk, sp = sorted_ops[0], sorted_ops[1]
    spays = sorted_ops[2:]
    sv = (spk >> 1).astype(jnp.int32)
    st = spk & 1
    # an a-element (tag 1) matches when its left neighbor is the b copy
    hit = jnp.concatenate([
        jnp.zeros((B, 1), bool),
        (sv[:, 1:] == sv[:, :-1]) & (st[:, 1:] == 1) & (st[:, :-1] == 0)
        & (sv[:, 1:] != INT32_MAX)], axis=1)
    crossed = [jnp.where(
        hit, jnp.concatenate([z[:, :1], p[:, :-1]], axis=1), 0)
        for p, z in zip(spays, zero_pays)]
    # un-sort by original position; a-side slots are positions L..2L-1
    unsorted = jax.lax.sort((sp, *crossed), num_keys=1)
    return tuple(c[:, L:] for c in unsorted[1:])


def _cross_lookup(nodes_a: jax.Array, nodes_b: jax.Array,
                  eidx_b: jax.Array) -> jax.Array:
    """Single-payload cross lookup (see _cross_lookup_multi)."""
    return _cross_lookup_multi(nodes_a, nodes_b, eidx_b)[0]


def _cross_lookup_bidir_multi(nodes_u, nodes_v, pays_u, pays_v,
                              want_sorted: bool = False):
    """BOTH cross directions from ONE merge sort, N payloads per side.

    The two `_cross_lookup_multi` calls of a join sort the same node
    union twice; fused, each u slot reads its matching v payload from the
    LEFT neighbor (v copies sort before u copies of the same node) and
    each v slot reads its matching u payload from the RIGHT neighbor.

    The un-sort needs NO carried position operand: the original
    [v block ascending | u block ascending] layout is exactly (tag, node)
    order, which is recomputed from the sorted key itself — so with one
    payload per side the merge is a 3-operand sort + 3-operand unsort
    (the packed-key SpG with a lo-only field layout, i.e. every published
    config) versus the 6 + 5 of the carried-position two-payload form.

    Returns (cross_u, cross_v): tuples where cross_u[i][b, l] is
    pays_v[i]'s value for nodes_u[b, l] in nodes_v (0 if absent), and
    symmetrically. Rows ascending, unique, INT32_MAX padded.

    want_sorted: additionally return the SORTED-ORDER cross planes
    (su_cross, su_mask, sv_cross, sv_mask), each [B, 2L]: su_cross[i] is
    pays_v[i]'s match at every u-copy position of the merged order (0
    where the partner is absent) and su_mask flags those u-copy
    positions. Order-invariant consumers (a masked set SUM, e.g. the
    fused mean path in models/net.py) can use these and let XLA
    dead-code-eliminate the un-sort entirely — halving the join's sort
    cost.
    """
    B, L = nodes_u.shape
    assert len(pays_u) == len(pays_v)
    vals = jnp.concatenate([nodes_v, nodes_u], axis=1)       # [B, 2L]
    tag = jnp.concatenate([
        jnp.zeros((B, L), jnp.uint32), jnp.ones((B, L), jnp.uint32)],
        axis=1)
    packed = (vals.astype(jnp.uint32) << 1) | tag
    # ONE payload operand per payload PAIR: the u and v payloads occupy
    # disjoint halves pre-sort, and after the merge each u slot reads its
    # LEFT neighbor (a v copy when hit) while each v slot reads its RIGHT
    # neighbor (a u copy when hit) — the tag disambiguates, so nothing is
    # lost by sharing the operand. Sort cost scales with operand count:
    # this makes the lo-only merge a 2-operand sort.
    from surel_plus_tpu.ops.merge_net import merge_enabled, merge_pairs
    from surel_plus_tpu.ops.pallas.bitonic_merge import (
        bitonic_enabled, bitonic_merge_pairs)

    if len(pays_u) == 1 and merge_enabled():
        # both halves are already sorted: the pure-XLA bitonic MERGE is
        # log2(n) compare-exchange stages vs lax.sort's ~log^2(n)/2,
        # and the row sorts are stage-count bound (probe_roofline);
        # SUREL_MERGE_NET selects the network wiring (rot | xor)
        spk, sp0 = merge_pairs(
            (nodes_v.astype(jnp.uint32) << 1), pays_v[0],
            (nodes_u.astype(jnp.uint32) << 1) | 1, pays_u[0])
        sp = (sp0,)
    elif len(pays_u) == 1 and bitonic_enabled():
        # Pallas variant — opt-in OFF (tunneled-runtime post-mortem in
        # the module)
        spk, sp0 = bitonic_merge_pairs(
            (nodes_v.astype(jnp.uint32) << 1), pays_v[0],
            (nodes_u.astype(jnp.uint32) << 1) | 1, pays_u[0])
        sp = (sp0,)
    else:
        mp = [jnp.concatenate([pv, pu], axis=1)
              for pu, pv in zip(pays_u, pays_v)]
        sorted_ops = jax.lax.sort((packed, *mp), num_keys=1)
        spk = sorted_ops[0]
        sp = sorted_ops[1:]
    snode = (spk >> 1).astype(jnp.int32)
    st = spk & 1
    # u slot (tag 1) matches when its left neighbor is the v copy
    hit_u = jnp.concatenate([
        jnp.zeros((B, 1), bool),
        (snode[:, 1:] == snode[:, :-1]) & (st[:, 1:] == 1)
        & (st[:, :-1] == 0) & (snode[:, 1:] != INT32_MAX)], axis=1)
    left = lambda x: jnp.concatenate([x[:, :1] * 0, x[:, :-1]], axis=1)
    cu = [jnp.where(hit_u, left(p), 0) for p in sp]
    # v slot (tag 0) matches when its right neighbor is the u copy
    hit_v = jnp.concatenate([
        (snode[:, :-1] == snode[:, 1:]) & (st[:, :-1] == 0)
        & (st[:, 1:] == 1) & (snode[:, :-1] != INT32_MAX),
        jnp.zeros((B, 1), bool)], axis=1)
    right = lambda x: jnp.concatenate([x[:, 1:], x[:, :1] * 0], axis=1)
    cv = [jnp.where(hit_v, right(p), 0) for p in sp]
    # un-sort: original layout == (tag, node) ascending, rebuilt from spk
    key2 = (st << 31) | (spk >> 1)
    out = jax.lax.sort((key2, *cu, *cv), num_keys=1)
    ocu = out[1:1 + len(cu)]
    ocv = out[1 + len(cu):]
    # u slots were positions L..2L-1, v slots 0..L-1
    aligned = (tuple(c[:, L:] for c in ocu), tuple(c[:, :L] for c in ocv))
    if not want_sorted:
        return aligned
    pad = snode != INT32_MAX
    su_mask = (st == 1) & pad
    sv_mask = (st == 0) & pad
    return aligned + (tuple(cu), su_mask, tuple(cv), sv_mask,
                      snode, st)


def _cross_lookup_bidir(nodes_u, nodes_v, hu, lu, hv, lv):
    """Two-payload (hi, lo) bidirectional lookup (see
    `_cross_lookup_bidir_multi`)."""
    (cu_h, cu_l), (cv_h, cv_l) = _cross_lookup_bidir_multi(
        nodes_u, nodes_v, (hu, lu), (hv, lv))
    return cu_h, cu_l, cv_h, cv_l


def gather_join(nodes: jax.Array, eidx: jax.Array, sizes: jax.Array,
                edges: jax.Array) -> JoinedBatch:
    """Join sampled sets for query edges.

    Args:
      nodes/eidx: SpG padded arrays, int32 [n, L].
      sizes:      int32 [n].
      edges:      int32 [Q, B] — Q endpoints per query (2 for links, 3 for
                  higher-order); entries are SpG row indices.

    For Q=2 the output mirrors `gather` (train.py:13-45): block 0 pairs
    (Z_u[x], Z_v[x]) for x in S_u, block 1 pairs (Z_v[x], Z_u[x]) for
    x in S_v.
    """
    rows_nodes = nodes[edges]   # [Q, B, L]
    rows_eidx = eidx[edges]
    rows_sizes = sizes[edges]   # [Q, B]

    if edges.shape[0] != 2:
        raise ValueError("gather_join handles Q=2; use hgather_join for "
                         "higher-order queries")

    nu, nv = rows_nodes[0], rows_nodes[1]
    eu, ev = rows_eidx[0], rows_eidx[1]
    cross_u = _cross_lookup(nu, nv, ev)   # v-encodings of S_u nodes
    cross_v = _cross_lookup(nv, nu, eu)   # u-encodings of S_v nodes

    eidx_out = jnp.stack([
        jnp.stack([eu, cross_u], axis=-1),
        jnp.stack([ev, cross_v], axis=-1),
    ])
    mask = rows_nodes != INT32_MAX
    return JoinedBatch(eidx=eidx_out, mask=mask, sizes=rows_sizes)


def unpack_key_features(khi: jax.Array, klo: jax.Array, num_walks: int,
                        num_steps: int) -> jax.Array:
    """Unpack packed landing-count keys into normalized float features
    [..., num_steps+1] (counts / num_walks, the main.py:174 normalization).
    Elementwise shifts and masks — fuses into the consuming matmul."""
    from surel_plus_tpu.ops.walk import enc_field_layout

    shift, starts, lead_bit = enc_field_layout(num_walks, num_steps)
    mask = jnp.uint32((1 << shift) - 1)

    def field(start_bit):
        if start_bit < 32:
            return (klo >> jnp.uint32(start_bit)) & mask
        return (khi >> jnp.uint32(start_bit - 32)) & mask

    if lead_bit < 32:
        root = (klo >> jnp.uint32(lead_bit)) & jnp.uint32(1)
    else:
        root = (khi >> jnp.uint32(lead_bit - 32)) & jnp.uint32(1)
    cols = [root * jnp.uint32(num_walks)] + [
        field(starts[j]) for j in range(1, num_steps + 1)]
    feats = jnp.stack(cols, axis=-1).astype(jnp.float32)
    return feats / num_walks


def make_keys_join(num_walks: int, num_steps: int, impl: str = "merge"):
    """Returns a join function over an SpGKeys layout producing float
    feature pairs directly (JoinedBatch.eidx [2, B, L, 2, ncol] float32):
    the anchor slot's unpacked encoding paired with the partner's (zero
    vector if absent — key 0 unpacks to the zero row).

    impl: 'merge' (sort-based, default) or 'pallas' (in-VMEM equality
    contraction kernel, ops/pallas/join_kernel.py; batch must be a
    multiple of its ROWS tile)."""

    def join(nodes, khi, klo, sizes, edges):
        return join_gathered_keys(nodes[edges], khi[edges], klo[edges],
                                  sizes[edges], num_walks, num_steps,
                                  impl=impl)

    return join


def join_gathered_keys(rows_nodes, rows_hi, rows_lo, rows_sizes,
                       num_walks: int, num_steps: int,
                       impl: str = "merge") -> JoinedBatch:
    """Keys join over pre-gathered rows ([2, B, L] each) — used directly
    by the distributed path, where rows arrive via sharded psum gathers."""
    from surel_plus_tpu.ops.walk import enc_field_layout

    nu, nv = rows_nodes[0], rows_nodes[1]
    lead_bit = enc_field_layout(num_walks, num_steps)[2]
    lo_only = lead_bit < 32
    # "lead-in-hi": counts fill the lo word exactly, the hi word holds
    # ONLY the root bit (S=4, M=200: ppa/tags-math). The root indicator
    # is derivable from node ids (slot is root iff node == the set's
    # seed; cross side iff node == the partner's seed), so the merge
    # still runs on the lo word alone and root PLANES replace key bits.
    lead_hi = lead_bit == 32
    if impl == "pallas":
        from surel_plus_tpu.ops.pallas.join_kernel import (
            pallas_cross_lookup_pair)

        cross_hi_u, cross_lo_u = pallas_cross_lookup_pair(
            nu, nv, rows_hi[1], rows_lo[1])
        cross_hi_v, cross_lo_v = pallas_cross_lookup_pair(
            nv, nu, rows_hi[0], rows_lo[0])
    elif lo_only or lead_hi:
        ((cross_lo_u,), (cross_lo_v,), (scu,), su_mask, (scv,),
         sv_mask, snode, stag) = _cross_lookup_bidir_multi(
            nu, nv, (rows_lo[0],), (rows_lo[1],), want_sorted=True)
        if lead_hi:
            rbit_u = (rows_hi[0] & 1).astype(jnp.int32)
            rbit_v = (rows_hi[1] & 1).astype(jnp.int32)
            u_b = jnp.max(jnp.where(rbit_u > 0, nu, -1), axis=1)
            v_b = jnp.max(jnp.where(rbit_v > 0, nv, -1), axis=1)
            cross_hi_u = ((nu == v_b[:, None])
                          & (nu != INT32_MAX)).astype(jnp.uint32)
            cross_hi_v = ((nv == u_b[:, None])
                          & (nv != INT32_MAX)).astype(jnp.uint32)
        else:
            cross_hi_u = jnp.zeros_like(cross_lo_u)
            cross_hi_v = jnp.zeros_like(cross_lo_v)
    else:
        cross_hi_u, cross_lo_u, cross_hi_v, cross_lo_v = \
            _cross_lookup_bidir(nu, nv, rows_hi[0], rows_lo[0],
                                rows_hi[1], rows_lo[1])
    khi_pairs = jnp.stack([
        jnp.stack([rows_hi[0], cross_hi_u], axis=-1),
        jnp.stack([rows_hi[1], cross_hi_v], axis=-1),
    ])                              # [2, B, L, 2]
    klo_pairs = jnp.stack([
        jnp.stack([rows_lo[0], cross_lo_u], axis=-1),
        jnp.stack([rows_lo[1], cross_lo_v], axis=-1),
    ])
    feats = unpack_key_features(khi_pairs, klo_pairs, num_walks, num_steps)
    mask = rows_nodes != jnp.int32(INT32_MAX)
    kown = kcross = kcross_mask = kcross_al = None
    kown_root = kcross_root = kcross_al_root = None
    if (lo_only or lead_hi) and impl != "pallas":
        kown = jnp.stack([rows_lo[0], rows_lo[1]])
        # ONE shared merged-sort plane: each direction's matches occupy
        # disjoint (tag-separated) positions, selected by the per-q mask
        kcross = scu + scv                           # [B, 2L]
        kcross_mask = jnp.stack([su_mask, sv_mask])
        kcross_al = jnp.stack([cross_lo_u, cross_lo_v])
        if lead_hi:
            kown_root = jnp.stack([rbit_u, rbit_v])
            kcross_root = (
                ((stag == 1) & (snode == v_b[:, None]))
                | ((stag == 0) & (snode == u_b[:, None]))
            ).astype(jnp.int32)
            kcross_al_root = jnp.stack(
                [cross_hi_u.astype(jnp.int32),
                 cross_hi_v.astype(jnp.int32)])
    return JoinedBatch(eidx=feats, mask=mask, sizes=rows_sizes,
                       kown=kown, kcross=kcross, kcross_mask=kcross_mask,
                       kcross_al=kcross_al, kown_root=kown_root,
                       kcross_root=kcross_root,
                       kcross_al_root=kcross_al_root)


def join_gathered_hkeys(rn, rh, rl, rs, num_walks: int,
                        num_steps: int) -> JoinedBatch:
    """Hyperedge keys join over pre-gathered endpoint rows ([3, B, L]
    each) — the distributed path feeds rows arriving via sharded psum
    gathers (parallel/dist.py DistributedKeysHTrainStep); single-device
    callers use make_keys_hjoin below."""
    from surel_plus_tpu.ops.walk import enc_field_layout

    lead_bit = enc_field_layout(num_walks, num_steps)[2]
    lo_only = lead_bit < 32
    lead_hi = lead_bit == 32   # see join_gathered_keys
    # the four anchor/cross groups (u|w, w|u, v|w, w|v) are two
    # bidirectional pairs — one fused merge sort each
    khi_list, klo_list, masks = [], [], []
    planes, pmasks, proots, ownroots = [], [], [], []
    for a, b in ((0, 2), (1, 2)):
        if lo_only or lead_hi:
            ((ca_l,), (cb_l,), (sca,), sa_mask, (scb,),
             sb_mask, snode, stag) = _cross_lookup_bidir_multi(
                rn[a], rn[b], (rl[a],), (rl[b],), want_sorted=True)
            if lead_hi:
                rb_a = (rh[a] & 1).astype(jnp.int32)
                rb_b = (rh[b] & 1).astype(jnp.int32)
                a_id = jnp.max(jnp.where(rb_a > 0, rn[a], -1), axis=1)
                b_id = jnp.max(jnp.where(rb_b > 0, rn[b], -1), axis=1)
                ca_h = ((rn[a] == b_id[:, None])
                        & (rn[a] != INT32_MAX)).astype(jnp.uint32)
                cb_h = ((rn[b] == a_id[:, None])
                        & (rn[b] != INT32_MAX)).astype(jnp.uint32)
                proots.append((
                    ((stag == 1) & (snode == b_id[:, None]))
                    | ((stag == 0) & (snode == a_id[:, None]))
                ).astype(jnp.int32))
                ownroots.extend([rb_a, rb_b])
            else:
                ca_h = jnp.zeros_like(ca_l)
                cb_h = jnp.zeros_like(cb_l)
            planes.append(sca + scb)   # disjoint tag-split positions
            pmasks.append((sa_mask, sb_mask))
        else:
            ca_h, ca_l, cb_h, cb_l = _cross_lookup_bidir(
                rn[a], rn[b], rh[a], rl[a], rh[b], rl[b])
        khi_list.append(jnp.stack([rh[a], ca_h], axis=-1))
        klo_list.append(jnp.stack([rl[a], ca_l], axis=-1))
        masks.append(rn[a] != INT32_MAX)
        khi_list.append(jnp.stack([rh[b], cb_h], axis=-1))
        klo_list.append(jnp.stack([rl[b], cb_l], axis=-1))
        masks.append(rn[b] != INT32_MAX)
    feats = unpack_key_features(jnp.stack(khi_list),
                                jnp.stack(klo_list),
                                num_walks, num_steps)
    sizes_out = jnp.stack([rs[0], rs[2], rs[1], rs[2]])
    kown = kcross = kcross_mask = None
    kown_root = kcross_root = None
    if lo_only or lead_hi:
        # fused-kernel planes: ONE [B, 4L] cross plane (the two
        # merges' planes side by side) selected per group by masks
        # that cover only the group's merge half (models/honet.py)
        kown = jnp.stack([rl[0], rl[2], rl[1], rl[2]])
        kcross = jnp.concatenate(planes, axis=1)
        z = jnp.zeros_like(pmasks[0][0])
        kcross_mask = jnp.stack([
            jnp.concatenate([pmasks[0][0], z], axis=1),
            jnp.concatenate([pmasks[0][1], z], axis=1),
            jnp.concatenate([z, pmasks[1][0]], axis=1),
            jnp.concatenate([z, pmasks[1][1]], axis=1),
        ])
        if lead_hi:
            kown_root = jnp.stack(ownroots)
            kcross_root = jnp.concatenate(proots, axis=1)
    return JoinedBatch(eidx=feats, mask=jnp.stack(masks),
                       sizes=sizes_out, kown=kown, kcross=kcross,
                       kcross_mask=kcross_mask, kown_root=kown_root,
                       kcross_root=kcross_root)


def make_keys_hjoin(num_walks: int, num_steps: int):
    """Packed-key variant of hgather_join (train.py:48-72's four segment
    groups u|w, w|u, v|w, w|v) producing unpacked float feature pairs."""

    def join(nodes, khi, klo, sizes, hedges):
        if hedges.shape[0] != 3:
            raise ValueError("expects [3, B] hyperedges")
        return join_gathered_hkeys(nodes[hedges], khi[hedges],
                                   klo[hedges], sizes[hedges],
                                   num_walks, num_steps)

    return join


def hgather_join(nodes: jax.Array, eidx: jax.Array, sizes: jax.Array,
                 hedges: jax.Array) -> JoinedBatch:
    """Higher-order join for 3-node queries (u, v, w), reproducing `hgather`
    (train.py:48-72): four segment groups — (u | w), (w | u), (v | w),
    (w | v) — each pairing a set's own encodings with the cross encodings
    of the partner endpoint."""
    if hedges.shape[0] != 3:
        raise ValueError("hgather_join expects [3, B] hyperedges")
    rows_nodes = nodes[hedges]   # [3, B, L]
    rows_eidx = eidx[hedges]
    rows_sizes = sizes[hedges]

    nu, nv, nw = rows_nodes
    eu, ev, ew = rows_eidx

    pairs = [
        (nu, eu, nw, ew),   # u anchored, cross w   (train.py:61,64)
        (nw, ew, nu, eu),   # w anchored, cross u   (train.py:61,66)
        (nv, ev, nw, ew),   # v anchored, cross w   (train.py:62,65)
        (nw, ew, nv, ev),   # w anchored, cross v   (train.py:62,67)
    ]
    blocks = []
    masks = []
    for na, ea, nb, eb in pairs:
        cross = _cross_lookup(na, nb, eb)
        blocks.append(jnp.stack([ea, cross], axis=-1))
        masks.append(na != INT32_MAX)
    sizes_out = jnp.stack(
        [rows_sizes[0], rows_sizes[2], rows_sizes[1], rows_sizes[2]])
    return JoinedBatch(eidx=jnp.stack(blocks), mask=jnp.stack(masks),
                       sizes=sizes_out)
