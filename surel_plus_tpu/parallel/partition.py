"""Edge-partitioned graphs + frontier-exchange sampling (multi-host).

The reference is strictly single-device (main.py:128-129; README "Single
GPU training") — this module is the capability it lacks: graphs larger
than one device's HBM, sampled across a device mesh (and across hosts via
`jax.distributed`, see `init_distributed`).

Design:
  * the CSR is partitioned by contiguous node ranges: shard g owns rows
    [g*rps, (g+1)*rps). Each device holds ONLY its shard (indptr rebased
    to the shard start, indices/shuffled padded to the max shard nnz) —
    total graph memory divides by the mesh size.
  * walks cross partitions through an owner-computed frontier exchange;
    two interchangeable transports (identical results):
      - `_route_step`: capacity-routed — requests counting-sort
        by owner into a [G, C] buffer, one `all_to_all` each way; per-
        device work O(R), wire bytes O(R). Falls back to the probe for a
        whole step if a destination overflows C = 1.25*R/G (binomially
        negligible at production R, decided by a mesh-uniform psum).
      - `_probe_step` (default): every device sees every request
        (`all_gather`), answers what it owns; O(G*R) owner work but zero
        routing overhead. Measured faster on the virtual CPU mesh (where
        gathers are cheap vector loads: probe x1.0-1.16 vs replicated,
        capacity x1.7-2.3); the capacity transport's O(R) advantage is
        sized for real TPU meshes (per-element gathers ~1/cycle, G
        large) — flip the default after measuring on multi-chip
        hardware.
    The walk STATE never leaves the seed's device; only (id, answer)
    scalars cross the interconnect.
  * randomness is generated at the global block shape and sliced per
    shard, so partitioned sampling is BIT-IDENTICAL to the single-device
    kernel (ops/walk.py:_walk_block) for the same key — tested in
    tests/test_partition.py.
  * set building (dedup + landing counts + key packing) is per-seed local
    (ops/walk.py:_build_sets_packed_block) and embarrassingly parallel.

For graphs that FIT device HBM, the seed-parallel replicated path
(parallel/dist.py:sample_gsets_sharded) remains the fast choice (zero
communication); this module is the capacity path. A replica-group hybrid
(graph sharded over K devices, seed-parallel across G/K groups) comes out
of choosing the mesh: partition over 'graph', replicate over 'data'.
"""

from __future__ import annotations

import dataclasses
import logging
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from surel_plus_tpu.graph.csr import CSRGraph
from surel_plus_tpu.ops import walk as walk_ops

log = logging.getLogger(__name__)


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None,
                     local_device_ids=None) -> None:
    """Initialize multi-host JAX (one controller process per host).

    On TPU pods the arguments are inferred from the environment; on
    CPU/GPU clusters pass them explicitly. Safe to call once per process
    before any jax computation. The reference has no analog (single
    process, single GPU)."""
    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    if local_device_ids is not None:
        kwargs["local_device_ids"] = local_device_ids
    jax.distributed.initialize(**kwargs)
    log.info("jax.distributed: process %d/%d, %d local / %d global devices",
             jax.process_index(), jax.process_count(),
             jax.local_device_count(), jax.device_count())


@dataclasses.dataclass
class PartitionedCSR:
    """Row-range partitioned CSR, stacked [G, ...] for shard_map feeding.

    indptr:   int32 [G, rps+1] — rebased to each shard's start.
    indices:  int32 [G, Emax]  — global neighbor ids, zero-padded.
    shuffled: int32 [G, Emax]  — per-row random permutation of indices
              (the step-0 without-replacement source), same padding.
    etab/stab: int32 [G, Emax, 3] optional edge tables for the
              one-row-gather-per-step frontier exchange: row j of shard g
              is (nbr, nbr_edge_base, nbr_deg) for nbr = indices[g, j]
              (resp. shuffled[g, j]), where nbr_edge_base is the offset of
              nbr's adjacency inside ITS OWNER's local edge arrays. Costs
              3x edge memory per word kept; `partition_csr(...,
              edge_tables=False)` drops them for memory-bound graphs.
    """

    indptr: np.ndarray
    indices: np.ndarray
    shuffled: np.ndarray
    rows_per_shard: int
    num_nodes: int
    num_shards: int
    etab: Optional[np.ndarray] = None
    stab: Optional[np.ndarray] = None

    @property
    def num_edges(self) -> int:
        return int(self.indptr[:, -1].sum())


def partition_csr(graph: CSRGraph, n_shards: int, seed: int = 111413,
                  edge_tables: bool = True) -> PartitionedCSR:
    """Split a CSR graph into `n_shards` contiguous row ranges.

    The per-row shuffle matches `shuffled_indices_for` (same native
    kernel / numpy fallback and the same seed convention), so partitioned
    walks reproduce single-device walks exactly.

    With `edge_tables` (default), also builds the [G, Emax, 3]
    (nbr, nbr_edge_base, nbr_deg) tables that let the frontier exchange
    answer each request with a single row gather (see
    `_probe_step_rows`)."""
    from surel_plus_tpu.ops.sampler import shuffled_indices_for

    N = graph.num_nodes
    rps = (N + n_shards - 1) // n_shards
    shuffled_global = np.asarray(shuffled_indices_for(graph, seed))

    emax = 0
    for g in range(n_shards):
        a, b = g * rps, min((g + 1) * rps, N)
        emax = max(emax, int(graph.indptr[b] - graph.indptr[a]))

    indptr = np.zeros((n_shards, rps + 1), np.int32)
    indices = np.zeros((n_shards, emax), np.int32)
    shuffled = np.zeros((n_shards, emax), np.int32)
    gptr = graph.indptr.astype(np.int64)
    if edge_tables:
        # per-node (edge base inside the owner's shard, degree), host-side
        shard_base = gptr[np.minimum(
            np.arange(n_shards, dtype=np.int64) * rps, N)]
        node_owner = np.arange(N, dtype=np.int64) // rps
        node_ebase = (gptr[:-1] - shard_base[node_owner]).astype(np.int32)
        node_deg = (gptr[1:] - gptr[:-1]).astype(np.int32)
        etab = np.zeros((n_shards, emax, 3), np.int32)
        stab = np.zeros((n_shards, emax, 3), np.int32)
    else:
        etab = stab = None
    for g in range(n_shards):
        a, b = g * rps, min((g + 1) * rps, N)
        base = int(graph.indptr[a])
        nnz = int(graph.indptr[b]) - base
        local = gptr[a:b + 1] - base
        indptr[g, :b - a + 1] = local
        indptr[g, b - a + 1:] = local[-1]  # padded rows: degree 0
        indices[g, :nnz] = graph.indices[base:base + nnz]
        shuffled[g, :nnz] = shuffled_global[base:base + nnz]
        if edge_tables:
            for tab, col in ((etab, indices[g, :nnz]),
                             (stab, shuffled[g, :nnz])):
                tab[g, :nnz, 0] = col
                tab[g, :nnz, 1] = node_ebase[col]
                tab[g, :nnz, 2] = node_deg[col]
    return PartitionedCSR(indptr=indptr, indices=indices, shuffled=shuffled,
                          rows_per_shard=rps, num_nodes=N,
                          num_shards=n_shards, etab=etab, stab=stab)


def _probe_step(lindptr, table, nodes, aux, shard, rps, axis):
    """Owner-computed neighbor pick for a frontier of walkers.

    nodes/aux: [B, M] local requests (global node id, random draw).
    Every device receives all requests (ids are 4 bytes vs rows of
    hundreds — the id broadcast is noise next to graph rows), answers the
    ones it owns from its local shard, masks the rest to 0, and one
    all_to_all routes answer blocks back; the sum over owners (exactly
    one per node) reconstructs every answer.
    """
    all_nodes = jax.lax.all_gather(nodes, axis)     # [G, B, M]
    all_aux = jax.lax.all_gather(aux, axis)
    lid = all_nodes - shard * rps
    owned = (lid >= 0) & (lid < rps)
    safe = jnp.clip(lid, 0, rps - 1)
    start = lindptr[safe]
    deg = lindptr[safe + 1] - start
    pick = (all_aux % jnp.maximum(deg, 1).astype(jnp.uint32)
            ).astype(jnp.int32)
    ans = table[start + pick]
    ans = jnp.where(deg > 0, ans, all_nodes)        # degree-0: stay
    ans = jnp.where(owned, ans, 0)
    routed = jax.lax.all_to_all(ans, axis, split_axis=0, concat_axis=0,
                                tiled=False)        # [G, B, M]
    return routed.sum(axis=0)


def _route_step(lindptr, table, nodes, aux, shard, rps, axis, G_int,
                capacity_slack: float = 1.25):
    """Capacity-routed owner-computed neighbor pick — the scalable
    alternative to `_probe_step`.

    `_probe_step` broadcasts every request to every device, so owner-side
    work is G x redundant. Here each request travels ONLY to its owner:
      1. row-sort requests by destination shard (fast batched sort),
      2. per-destination ranks via searchsorted + cumsums (vector ops),
      3. scatter into a [G, C] send buffer (R one-element scatters —
         same per-element rate as gathers, but R of them, not G*R),
      4. one all_to_all out, owner gathers answers for slack*R slots,
         one all_to_all back, requester gathers its R answers by rank.
    Per-device cost ~(4+slack)*R element ops and ~3*slack*R*4 bytes on
    the wire vs (1+2G)*R ops / 12*G*R bytes for the probe.

    C = slack * R/G. Per-dest counts concentrate (binomial, sigma/mu =
    sqrt(G/R)), so overflow is vanishingly rare at production R; when it
    does happen every device jointly falls back to the probe path for
    the whole frontier (uniform predicate via psum) — results are
    identical either way.
    """
    B, M = nodes.shape
    R = B * M
    cap = int(np.ceil(capacity_slack * R / G_int))

    dest = (nodes // rps).astype(jnp.int32)          # [B, M]
    # 1. row-sort by dest carrying (node, aux, original column)
    col = jnp.broadcast_to(jnp.arange(M, dtype=jnp.int32)[None, :], (B, M))
    sdest, snode, saux, scol = jax.lax.sort(
        (dest, nodes, aux, col), dimension=1, num_keys=1)

    # 2. per-row per-dest span starts: lower_bound of g in sorted dests
    targets = jnp.broadcast_to(
        jnp.arange(G_int + 1, dtype=jnp.int32)[None, :], (B, G_int + 1))
    bounds = walk_ops.rows_searchsorted(sdest, targets)  # [B, G+1]
    cnt = bounds[:, 1:] - bounds[:, :-1]                 # [B, G]
    row_pref = jnp.cumsum(cnt, axis=0) - cnt             # excl over rows
    t_total = cnt.sum(axis=0)                            # [G]

    # 3. per-element rank within its destination
    span_start = jnp.take_along_axis(bounds, sdest, axis=1)  # [B, M]
    rpref = jnp.take_along_axis(row_pref, sdest, axis=1)     # [B, M]
    pos_in_row = jnp.broadcast_to(
        jnp.arange(M, dtype=jnp.int32)[None, :], (B, M))
    rank = rpref + (pos_in_row - span_start)                 # [B, M]
    slot = sdest * cap + rank                                # [B, M]
    ok = rank < cap

    def capacity_path(_):
        send_node = jnp.zeros((G_int * cap,), jnp.int32)
        send_aux = jnp.zeros((G_int * cap,), jnp.uint32)
        # overflowed ranks target the out-of-range sentinel -> dropped
        # (the cond falls back to the probe path in that case anyway)
        safe_slot = jnp.where(ok, slot, G_int * cap).reshape(-1)
        send_node = send_node.at[safe_slot].set(
            snode.reshape(-1), mode="drop")
        send_aux = send_aux.at[safe_slot].set(
            saux.reshape(-1), mode="drop")
        sb_node = send_node.reshape(G_int, cap)
        sb_aux = send_aux.reshape(G_int, cap)
        rq_node = jax.lax.all_to_all(sb_node, axis, split_axis=0,
                                     concat_axis=0, tiled=False)
        rq_aux = jax.lax.all_to_all(sb_aux, axis, split_axis=0,
                                    concat_axis=0, tiled=False)
        lid = jnp.clip(rq_node - shard * rps, 0, rps - 1)
        start = lindptr[lid]
        deg = lindptr[lid + 1] - start
        pick = (rq_aux % jnp.maximum(deg, 1).astype(jnp.uint32)
                ).astype(jnp.int32)
        ans = table[start + pick]
        ans = jnp.where(deg > 0, ans, rq_node)
        ans_back = jax.lax.all_to_all(ans, axis, split_axis=0,
                                      concat_axis=0, tiled=False)
        got = ans_back.reshape(-1)[jnp.where(ok, slot, 0).reshape(-1)]
        got = got.reshape(B, M)
        # un-sort: place answers back at the original columns
        _, out = jax.lax.sort((scol, got), dimension=1, num_keys=1)
        return out

    def probe_path(_):
        return _probe_step(lindptr, table, nodes, aux, shard, rps, axis)

    overflow = jnp.any(t_total > cap)
    overflow = jax.lax.psum(overflow.astype(jnp.int32), axis) > 0
    return jax.lax.cond(overflow, probe_path, capacity_path, operand=None)


def _seed_info_probe(lindptr, sd, shard, rps, axis):
    """One [B]-shaped exchange fetching each seed's (edge_base, degree)
    from its owner — the entry state for the edge-table walk."""
    all_sd = jax.lax.all_gather(sd, axis)               # [G, B]
    lid = all_sd - shard * rps
    owned = (lid >= 0) & (lid < rps)
    safe = jnp.clip(lid, 0, rps - 1)
    start = lindptr[safe]
    deg = lindptr[safe + 1] - start
    vals = jnp.stack([start, deg], axis=-1)             # [G, B, 2]
    vals = jnp.where(owned[..., None], vals, 0)
    routed = jax.lax.all_to_all(vals, axis, split_axis=0, concat_axis=0,
                                tiled=False)
    out = routed.sum(axis=0)                            # [B, 2]
    return out[..., 0], out[..., 1]


def _probe_step_rows(table3, owner, eidx, shard, axis):
    """Owner-computed edge-table lookup for a frontier of walkers.

    owner/eidx: [B, M] request (owning shard, edge index into that
    shard's [Emax, 3] table). The owner answers with the full
    (nbr, nbr_edge_base, nbr_deg) row — ONE row gather per request,
    against the three per-element gathers of the bare-pick `_probe_step`
    (the same ~2.5x lever as the single-device edge-table walk,
    ops/walk.py:_walk_block_tables)."""
    all_owner = jax.lax.all_gather(owner, axis)         # [G, B, M]
    all_eidx = jax.lax.all_gather(eidx, axis)
    owned = all_owner == shard
    safe = jnp.clip(all_eidx, 0, table3.shape[0] - 1)
    rows = table3[safe]                                 # [G, B, M, 3]
    rows = jnp.where(owned[..., None], rows, 0)
    routed = jax.lax.all_to_all(rows, axis, split_axis=0, concat_axis=0,
                                tiled=False)
    return routed.sum(axis=0)                           # [B, M, 3]


def _route_step_rows(table3, owner, eidx, shard, axis, G_int,
                     capacity_slack: float = 1.25):
    """Capacity-routed variant of `_probe_step_rows`: requests travel
    only to their owner ([G, C] buffers, one all_to_all each way), the
    answer is the [3]-row; falls back to the probe for the whole step on
    (binomially negligible) capacity overflow, decided mesh-uniformly."""
    B, M = owner.shape
    R = B * M
    cap = int(np.ceil(capacity_slack * R / G_int))

    col = jnp.broadcast_to(jnp.arange(M, dtype=jnp.int32)[None, :], (B, M))
    sdest, seidx, scol = jax.lax.sort(
        (owner, eidx, col), dimension=1, num_keys=1)

    targets = jnp.broadcast_to(
        jnp.arange(G_int + 1, dtype=jnp.int32)[None, :], (B, G_int + 1))
    bounds = walk_ops.rows_searchsorted(sdest, targets)  # [B, G+1]
    cnt = bounds[:, 1:] - bounds[:, :-1]
    row_pref = jnp.cumsum(cnt, axis=0) - cnt
    t_total = cnt.sum(axis=0)

    span_start = jnp.take_along_axis(bounds, sdest, axis=1)
    rpref = jnp.take_along_axis(row_pref, sdest, axis=1)
    pos_in_row = jnp.broadcast_to(
        jnp.arange(M, dtype=jnp.int32)[None, :], (B, M))
    rank = rpref + (pos_in_row - span_start)
    slot = sdest * cap + rank
    ok = rank < cap

    def capacity_path(_):
        send = jnp.zeros((G_int * cap,), jnp.int32)
        safe_slot = jnp.where(ok, slot, G_int * cap).reshape(-1)
        send = send.at[safe_slot].set(seidx.reshape(-1), mode="drop")
        rq = jax.lax.all_to_all(send.reshape(G_int, cap), axis,
                                split_axis=0, concat_axis=0, tiled=False)
        rows = table3[jnp.clip(rq, 0, table3.shape[0] - 1)]   # [G, C, 3]
        back = jax.lax.all_to_all(rows, axis, split_axis=0, concat_axis=0,
                                  tiled=False)
        got = back.reshape(-1, 3)[jnp.where(ok, slot, 0).reshape(-1)]
        got = got.reshape(B, M, 3)
        _, n_, e_, d_ = jax.lax.sort(
            (scol, got[..., 0], got[..., 1], got[..., 2]),
            dimension=1, num_keys=1)
        return jnp.stack([n_, e_, d_], axis=-1)

    def probe_path(_):
        return _probe_step_rows(table3, owner, eidx, shard, axis)

    overflow = jnp.any(t_total > cap)
    overflow = jax.lax.psum(overflow.astype(jnp.int32), axis) > 0
    return jax.lax.cond(overflow, probe_path, capacity_path, operand=None)


def _walk_bare_exchange(lindptr, lindices, lshuffled, sd, key, shard,
                        step_fn, M, S, per, n_pad, slice_idx=None):
    """Frontier-exchange walk answering bare neighbor picks (the original
    transport: three per-element owner gathers per request)."""
    # ---- step 0: m-th shuffled neighbor (without replacement,
    # ops/walk.py:_walk_block's shuffled-indices semantics) ----
    m = jnp.broadcast_to(
        jnp.arange(M, dtype=jnp.int32)[None, :], (per, M))
    cur = step_fn(lindptr, lshuffled,
                  jnp.broadcast_to(sd[:, None], (per, M)),
                  m.astype(jnp.uint32), shard)
    walks = [cur]

    # ---- steps 1..S-1: uniform with replacement; bits generated at
    # the GLOBAL block shape and sliced so every shard count yields
    # the same walks (reproducibility across meshes) ----
    if S > 1:
        step_keys = jax.random.split(key, S - 1)

        def body(cur, step_key):
            r_full = jax.random.bits(step_key, (n_pad, M),
                                     dtype=jnp.uint32)
            r = jax.lax.dynamic_slice_in_dim(
                r_full, (shard if slice_idx is None else slice_idx) * per,
                per, axis=0)
            nxt = step_fn(lindptr, lindices, cur, r, shard)
            return nxt, nxt

        _, rest = jax.lax.scan(body, cur, step_keys)
        walks += [rest[i] for i in range(S - 1)]
    return jnp.stack(walks, axis=-1)                # [per, M, S]


def _walk_tables_exchange(lindptr, letab, lstab, sd, key, shard, rows_fn,
                          rps, axis, M, S, per, n_pad, slice_idx=None):
    """Frontier-exchange walk over the [Emax, 3] edge tables: walkers
    carry (cur, edge_base, deg), picks are computed requester-side, and
    the owner answers each request with ONE row gather (the partitioned
    mirror of ops/walk.py:_walk_block_tables — bit-exact with it and
    with the bare exchange)."""
    sstart, sdeg = _seed_info_probe(lindptr, sd, shard, rps, axis)
    m = jnp.arange(M, dtype=jnp.int32)
    offs = m[None, :] % jnp.maximum(sdeg[:, None], 1)
    owner0 = jnp.broadcast_to((sd // rps)[:, None], (per, M))
    rows0 = rows_fn(lstab, owner0, sstart[:, None] + offs, shard)
    live0 = sdeg[:, None] > 0
    cur = jnp.where(live0, rows0[..., 0], sd[:, None])
    walks = [cur]
    if S > 1:
        ebase = rows0[..., 1]
        deg = jnp.where(live0, rows0[..., 2], 0)
        step_keys = jax.random.split(key, S - 1)

        def body(carry, step_key):
            cur, ebase, deg = carry
            r_full = jax.random.bits(step_key, (n_pad, M),
                                     dtype=jnp.uint32)
            r = jax.lax.dynamic_slice_in_dim(
                r_full, (shard if slice_idx is None else slice_idx) * per,
                per, axis=0)
            pick = (r % jnp.maximum(deg, 1).astype(jnp.uint32)
                    ).astype(jnp.int32)
            rows = rows_fn(letab, cur // rps, ebase + pick, shard)
            live = deg > 0
            nxt = jnp.where(live, rows[..., 0], cur)
            eb2 = jnp.where(live, rows[..., 1], ebase)
            dg2 = jnp.where(live, rows[..., 2], deg)
            return (nxt, eb2, dg2), nxt

        _, rest = jax.lax.scan(body, (cur, ebase, deg), step_keys)
        walks += [rest[i] for i in range(S - 1)]
    return jnp.stack(walks, axis=-1)                # [per, M, S]


def sample_gsets_partitioned(
    pcsr: PartitionedCSR,
    seeds: np.ndarray,
    num_walks: int,
    num_steps: int,
    mesh: Mesh,
    seed: int = 111413,
    bucket: Optional[int] = None,
    routing: str = "probe",
    capacity_slack: float = 1.25,
):
    """Multi-device set sampling over an edge-partitioned graph.

    Seeds are sharded over the flattened mesh; each device walks its
    seeds, fetching neighbor picks from shard owners via the frontier
    exchange. Returns an SpGKeys row-sharded over the first mesh axis —
    feed it to shard_spg_keys / DistributedKeysTrainStep unchanged.

    Bit-identical to `walk_ops.sample_block(..., key)` on the whole seed
    block with the same key (random bits are generated at global shape
    and sliced per shard)."""
    from surel_plus_tpu.spg.spg import SpGKeys

    seeds = np.asarray(seeds, dtype=np.int32)
    n = len(seeds)
    if bucket is None:
        bucket = num_walks * num_steps + 1
    G = pcsr.num_shards
    ndev = int(np.prod(list(mesh.shape.values())))
    assert G == ndev, (G, ndev)
    per = (n + G - 1) // G
    n_pad = per * G
    seeds_pad = (np.concatenate([seeds, np.zeros(n_pad - n, np.int32)])
                 if n_pad > n else seeds)
    rps = pcsr.rows_per_shard
    M, S = num_walks, num_steps
    axis = "shard"
    flat_mesh = Mesh(np.asarray(mesh.devices).reshape(-1), (axis,))
    use_tables = pcsr.etab is not None

    if routing == "capacity":
        def step_fn(lp, tb, nd, au, sh):
            return _route_step(lp, tb, nd, au, sh, rps, axis, G,
                               capacity_slack=capacity_slack)

        def rows_fn(tb, ow, ei, sh):
            return _route_step_rows(tb, ow, ei, sh, axis, G,
                                    capacity_slack=capacity_slack)
    else:
        def step_fn(lp, tb, nd, au, sh):
            return _probe_step(lp, tb, nd, au, sh, rps, axis)

        def rows_fn(tb, ow, ei, sh):
            return _probe_step_rows(tb, ow, ei, sh, axis)

    def local(lindptr, lindices, lshuffled, letab, lstab, seeds_shard,
              key):
        shard = jax.lax.axis_index(axis)
        lindptr = lindptr[0]
        sd = seeds_shard[0]                         # [per]

        if use_tables:
            wmat = _walk_tables_exchange(
                lindptr, letab[0], lstab[0], sd, key, shard, rows_fn,
                rps, axis, M, S, per, n_pad)
        else:
            wmat = _walk_bare_exchange(
                lindptr, lindices[0], lshuffled[0], sd, key, shard,
                step_fn, M, S, per, n_pad)
        return walk_ops._build_sets_packed_block(
            sd, wmat, M, S, bucket, num_nodes=rps * G)

    sharded = jax.shard_map(
        local, mesh=flat_mesh,
        in_specs=(P(axis, None), P(axis, None), P(axis, None),
                  P(axis, None), P(axis, None), P(axis, None), P()),
        out_specs=(P(axis, None), P(axis), P(axis, None), P(axis, None)),
        check_vma=False,
    )
    nodes, sizes, hi, lo = jax.jit(sharded)(
        pcsr.indptr, pcsr.indices, pcsr.shuffled,
        pcsr.etab if use_tables else pcsr.indptr,
        pcsr.stab if use_tables else pcsr.indptr,
        seeds_pad.reshape(G, per), jax.random.PRNGKey(seed))
    if n_pad > n and jax.process_count() == 1:
        # trim seed padding (multi-process callers pass divisible counts:
        # slicing a non-fully-addressable global array is not allowed)
        nodes, sizes, hi, lo = nodes[:n], sizes[:n], hi[:n], lo[:n]
    return SpGKeys(nodes=nodes, khi=hi, klo=lo,
                   sizes=sizes, num_walks=num_walks,
                   num_steps=num_steps)


def sample_gsets_grouped(
    graph: CSRGraph,
    seeds: np.ndarray,
    num_walks: int,
    num_steps: int,
    mesh: Mesh,
    group_size: int,
    seed: int = 111413,
    bucket: Optional[int] = None,
    routing: str = "probe",
    capacity_slack: float = 1.25,
):
    """Replica-group sampling: the graph is partitioned over `group_size`
    devices (one replica per group), and seeds are data-parallel across
    the G/group_size groups — interpolating between the replicated
    seed-parallel path (group_size=1: zero communication, graph must fit
    one device) and the fully partitioned path (group_size=G: graph
    memory / G, frontier exchange inside the group only).

    Frontier exchange collectives run over the intra-group axis, so on
    real hardware they ride the shortest ICI hops. Returns an SpGKeys
    sharded over (groups x shard) row-major seed order."""
    from surel_plus_tpu.spg.spg import SpGKeys

    seeds = np.asarray(seeds, dtype=np.int32)
    n = len(seeds)
    if bucket is None:
        bucket = num_walks * num_steps + 1
    ndev = int(np.prod(list(mesh.shape.values())))
    assert ndev % group_size == 0, (ndev, group_size)
    n_groups = ndev // group_size
    pcsr = partition_csr(graph, group_size, seed=seed)
    rps = pcsr.rows_per_shard
    per = (n + ndev - 1) // ndev
    n_pad = per * ndev
    seeds_pad = (np.concatenate([seeds, np.zeros(n_pad - n, np.int32)])
                 if n_pad > n else seeds)
    M, S = num_walks, num_steps
    gmesh = Mesh(np.asarray(mesh.devices).reshape(n_groups, group_size),
                 ("group", "shard"))

    use_tables = pcsr.etab is not None

    if routing == "capacity":
        def gstep_fn(lp, tb, nd, au, sh):
            return _route_step(lp, tb, nd, au, sh, rps, "shard",
                               group_size, capacity_slack=capacity_slack)

        def grows_fn(tb, ow, ei, sh):
            return _route_step_rows(tb, ow, ei, sh, "shard", group_size,
                                    capacity_slack=capacity_slack)
    else:
        def gstep_fn(lp, tb, nd, au, sh):
            return _probe_step(lp, tb, nd, au, sh, rps, "shard")

        def grows_fn(tb, ow, ei, sh):
            return _probe_step_rows(tb, ow, ei, sh, "shard")

    # the per-shard CSR is REPLICATED across groups, partitioned within:
    # every group's shard s holds the same rows
    def local(lindptr, lindices, lshuffled, letab, lstab, seeds_shard,
              key):
        shard = jax.lax.axis_index("shard")
        group = jax.lax.axis_index("group")
        lindptr = lindptr[0]
        sd = seeds_shard[0, 0]                       # [per]
        flat_idx = group * group_size + shard

        if use_tables:
            wmat = _walk_tables_exchange(
                lindptr, letab[0], lstab[0], sd, key, shard, grows_fn,
                rps, "shard", M, S, per, n_pad, slice_idx=flat_idx)
        else:
            wmat = _walk_bare_exchange(
                lindptr, lindices[0], lshuffled[0], sd, key, shard,
                gstep_fn, M, S, per, n_pad, slice_idx=flat_idx)
        return walk_ops._build_sets_packed_block(
            sd, wmat, M, S, bucket, num_nodes=rps * group_size)

    sharded = jax.shard_map(
        local, mesh=gmesh,
        in_specs=(P("shard", None), P("shard", None), P("shard", None),
                  P("shard", None), P("shard", None),
                  P("group", "shard", None), P()),
        out_specs=(P(("group", "shard"), None), P(("group", "shard")),
                   P(("group", "shard"), None), P(("group", "shard"), None)),
        check_vma=False,
    )
    nodes, sizes, hi, lo = jax.jit(sharded)(
        pcsr.indptr, pcsr.indices, pcsr.shuffled,
        pcsr.etab if use_tables else pcsr.indptr,
        pcsr.stab if use_tables else pcsr.indptr,
        seeds_pad.reshape(n_groups, group_size, per),
        jax.random.PRNGKey(seed))
    if n_pad > n and jax.process_count() == 1:
        nodes, sizes, hi, lo = nodes[:n], sizes[:n], hi[:n], lo[:n]
    return SpGKeys(nodes=nodes, khi=hi, klo=lo, sizes=sizes,
                   num_walks=num_walks, num_steps=num_steps)
