"""Multi-chip distribution: data-parallel batches x row-sharded SpG.

The reference is strictly single-process / single-GPU (main.py:128-129,
README "Single GPU training"); this module is new capability, not a port.

Design (see SURVEY.md §2.3 consequence):
  mesh = (data, graph)
  * 'data'  — query batches sharded; gradients pmean'd (classic DP).
  * 'graph' — SpG rows (sampled sets + enc indices) sharded by contiguous
    row ranges; each device holds num_rows/graph_size rows. A batch gather
    of arbitrary rows is an owner-masked local gather + `psum` over 'graph'
    (exactly one owner per row, so the sum reconstructs the row). This is
    what lets billion-edge SpGs exceed single-chip HBM.
  * params + enc table — replicated (they are tiny: the encoding table is
    SUREL+'s compressed unique set, and the model is ~100k params).

Collectives ride ICI via `shard_map`; XLA overlaps the row-psum with the
local join where profitable.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from surel_plus_tpu.ops.join import JoinedBatch, gather_join
from surel_plus_tpu.spg.spg import SpG


def make_mesh(n_devices: Optional[int] = None,
              graph_axis: Optional[int] = None) -> Mesh:
    """Build a (data, graph) mesh over the first n_devices devices."""
    devices = jax.devices()[:n_devices] if n_devices else jax.devices()
    n = len(devices)
    if graph_axis is None:
        graph_axis = 2 if (n % 2 == 0 and n >= 2) else 1
    data_axis = n // graph_axis
    assert data_axis * graph_axis == n, (n, data_axis, graph_axis)
    dev_array = np.asarray(devices).reshape(data_axis, graph_axis)
    return Mesh(dev_array, axis_names=("data", "graph"))


def _pad_rows(arr: np.ndarray, rows: int) -> np.ndarray:
    if arr.shape[0] == rows:
        return arr
    pad = np.zeros((rows - arr.shape[0], *arr.shape[1:]), arr.dtype)
    return np.concatenate([arr, pad])


@dataclasses.dataclass
class ShardedSpG:
    """SpG padded to a multiple of the graph axis and sharded row-wise."""

    nodes: jax.Array   # [R, L] sharded P('graph', None)
    eidx: jax.Array
    sizes: jax.Array   # [R]
    enc: jax.Array     # [U+1, ncol] replicated
    rows_per_shard: int
    num_rows: int


def shard_spg(spg: SpG, mesh: Mesh) -> ShardedSpG:
    gp = mesh.shape["graph"]
    rows = ((spg.num_rows + gp - 1) // gp) * gp
    nodes = _pad_rows(spg.nodes, rows)
    eidx = _pad_rows(spg.eidx, rows)
    sizes = _pad_rows(spg.sizes, rows)
    row_sharding = NamedSharding(mesh, P("graph", None))
    size_sharding = NamedSharding(mesh, P("graph"))
    repl = NamedSharding(mesh, P())
    return ShardedSpG(
        nodes=jax.device_put(nodes, row_sharding),
        eidx=jax.device_put(eidx, row_sharding),
        sizes=jax.device_put(sizes, size_sharding),
        enc=jax.device_put(spg.enc_normalized(), repl),
        rows_per_shard=rows // gp,
        num_rows=spg.num_rows,
    )


def dist_gather_rows(local: jax.Array, row_ids: jax.Array,
                     rows_per_shard: int, axis: str = "graph") -> jax.Array:
    """Gather global rows from a row-sharded array inside shard_map.

    Each device masks rows it does not own to zero; a psum over the graph
    axis reconstructs every row (single-owner invariant). Simple and
    latency-optimal for small meshes; `dist_gather_rows_a2a` halves the
    bytes on larger graph axes.
    """
    shard = jax.lax.axis_index(axis)
    local_ids = row_ids - shard * rows_per_shard
    owned = (local_ids >= 0) & (local_ids < rows_per_shard)
    safe = jnp.clip(local_ids, 0, rows_per_shard - 1)
    got = local[safe]
    mask_shape = (owned.shape + (1,) * (got.ndim - owned.ndim))
    got = jnp.where(owned.reshape(mask_shape), got, 0)
    return jax.lax.psum(got, axis)


def dist_gather_rows_a2a(local: jax.Array, row_ids: jax.Array,
                         rows_per_shard: int,
                         axis: str = "graph") -> jax.Array:
    """All-to-all row gather: every device asks each peer for exactly the
    rows that peer owns, so each gathered row crosses the interconnect
    once (vs the psum variant's ring-allreduce of the full request shape).

    Because requests per peer vary, each device sends its FULL id list to
    every peer (ids are 4 bytes vs rows of hundreds of bytes — the id
    broadcast is noise) and answers with owner-masked rows, exchanged with
    one all_to_all. Cost per device: R * L bytes in + R * L out, where R
    is the request count — independent of the graph-axis size.
    """
    gp = jax.lax.psum(1, axis)
    shard = jax.lax.axis_index(axis)
    flat = row_ids.reshape(-1)
    n_req = flat.shape[0]
    # every peer's request list, gathered once (ids only)
    all_reqs = jax.lax.all_gather(flat, axis)          # [gp, R]
    local_ids = all_reqs - shard * rows_per_shard
    owned = (local_ids >= 0) & (local_ids < rows_per_shard)
    safe = jnp.clip(local_ids, 0, rows_per_shard - 1)
    answers = local[safe.reshape(-1)].reshape(
        (gp, n_req) + local.shape[1:])
    answers = jnp.where(
        owned.reshape((gp, n_req) + (1,) * (local.ndim - 1)), answers, 0)
    # route answers back: device d's answer block for peer p goes to p
    routed = jax.lax.all_to_all(answers, axis, split_axis=0, concat_axis=0,
                                tiled=False)           # [gp, R, ...]
    rows = routed.sum(axis=0)                          # single owner
    return rows.reshape(row_ids.shape + local.shape[1:])


def sample_gsets_sharded(graph, seeds: np.ndarray, num_walks: int,
                         num_steps: int, mesh: Mesh, seed: int = 111413,
                         bucket: Optional[int] = None):
    """Multi-device set sampling: seeds sharded over the flattened mesh,
    CSR replicated (each device walks its own seed range — sampling is
    embarrassingly parallel once the graph is resident; graphs beyond
    single-device HBM use per-host shards + the dist join instead).

    Returns an SpGKeys whose arrays are sharded over the first mesh axis.
    """
    import jax.numpy as jnp

    from surel_plus_tpu.ops import walk as walk_ops
    from surel_plus_tpu.ops.sampler import (device_graph,
                                            shuffled_indices_for,
                                            walk_tables_for)
    from surel_plus_tpu.spg.spg import SpGKeys

    seeds = np.asarray(seeds, dtype=np.int32)
    n = len(seeds)
    if bucket is None:
        bucket = num_walks * num_steps + 1
    ndev = int(np.prod(list(mesh.shape.values())))
    per = ((n + ndev - 1) // ndev)
    n_pad = per * ndev
    seeds_pad = np.concatenate(
        [seeds, np.zeros(n_pad - n, np.int32)]) if n_pad > n else seeds

    indptr, indices = device_graph(graph)
    shuffled = shuffled_indices_for(graph, seed)
    etab, stab = walk_tables_for(graph, seed)
    axis = tuple(mesh.axis_names)

    def local(indptr, indices, shuffled, tabs, seeds_shard, key):
        shard = jax.lax.axis_index(axis[0])
        k = jax.random.fold_in(key, shard)
        et, st = tabs if tabs is not None else (None, None)
        return walk_ops.sample_block(
            indptr, indices, shuffled, seeds_shard[0], k,
            num_walks=num_walks, num_steps=num_steps, bucket=bucket,
            etab=et, stab=st)

    flat_axis = axis[0]
    tabs = (etab, stab) if etab is not None else None
    sharded = jax.shard_map(
        local,
        mesh=Mesh(np.asarray(mesh.devices).reshape(-1), (flat_axis,)),
        in_specs=(P(), P(), P(), P(), P(flat_axis, None), P()),
        out_specs=(P(flat_axis, None), P(flat_axis),
                   P(flat_axis, None), P(flat_axis, None)),
        check_vma=False,
    )
    nodes, sizes, hi, lo = jax.jit(sharded)(
        indptr, indices, shuffled, tabs,
        jnp.asarray(seeds_pad).reshape(ndev, per),
        jax.random.PRNGKey(seed))
    return SpGKeys(nodes=nodes[:n], khi=hi[:n], klo=lo[:n],
                   sizes=sizes[:n], num_walks=num_walks,
                   num_steps=num_steps)


@dataclasses.dataclass
class ShardedSpGKeys:
    """Packed-key SpG padded to a multiple of the graph axis and sharded
    row-wise (the production multi-chip layout: no enc table to replicate,
    the join unpacks features on the fly)."""

    nodes: jax.Array
    khi: jax.Array
    klo: jax.Array
    sizes: jax.Array
    rows_per_shard: int
    num_rows: int
    num_walks: int
    num_steps: int


def shard_spg_keys(spgk, mesh: Mesh) -> ShardedSpGKeys:
    gp = mesh.shape["graph"]
    n = int(spgk.nodes.shape[0])
    rows = ((n + gp - 1) // gp) * gp
    row_sharding = NamedSharding(mesh, P("graph", None))
    size_sharding = NamedSharding(mesh, P("graph"))

    def put(x, sh):
        if isinstance(x, jax.Array) and not x.is_fully_addressable:
            # multi-process global array (e.g. from partitioned sampling):
            # np.asarray is illegal; pad on-device and reshard in place
            if x.shape[0] != rows:
                pad = jnp.zeros((rows - x.shape[0], *x.shape[1:]), x.dtype)
                x = jnp.concatenate([x, pad])
            return jax.device_put(x, sh)
        x = np.asarray(x)
        return jax.device_put(_pad_rows(x, rows), sh)

    return ShardedSpGKeys(
        nodes=put(spgk.nodes, row_sharding),
        khi=put(spgk.khi, row_sharding),
        klo=put(spgk.klo, row_sharding),
        sizes=put(spgk.sizes, size_sharding),
        rows_per_shard=rows // gp,
        num_rows=n,
        num_walks=spgk.num_walks,
        num_steps=spgk.num_steps,
    )


class DistributedKeysTrainStep:
    """(data x graph)-sharded train step over a row-sharded packed-key SpG:
    query rows are reconstructed with owner-masked psums over the graph
    axis, joined locally (merge join + on-the-fly unpack), batches are
    data-parallel, gradients pmean over 'data'."""

    def __init__(self, model, optimizer, mesh: Mesh,
                 sspg: ShardedSpGKeys):
        self.model = model
        self.optimizer = optimizer
        self.mesh = mesh
        self.sspg = sspg
        self._step = self._build()

    def _build(self):
        from surel_plus_tpu.ops.join import join_gathered_keys
        from surel_plus_tpu.ops.walk import INT32_MAX

        mesh, sspg = self.mesh, self.sspg
        rps = sspg.rows_per_shard
        M, S = sspg.num_walks, sspg.num_steps

        def step_local(params, opt_state, nodes, khi, klo, sizes,
                       edges, labels, weights, rng):
            rows_nodes = dist_gather_rows(nodes, edges, rps)
            rows_hi = dist_gather_rows(khi, edges, rps)
            rows_lo = dist_gather_rows(klo, edges, rps)
            rows_sizes = dist_gather_rows(sizes, edges, rps)
            # restore padding sentinels lost to the psum-masking of
            # non-owners (owner contributes them; zeros elsewhere)
            L = rows_nodes.shape[-1]
            slot = jnp.arange(L, dtype=jnp.int32)
            valid = slot[None, None, :] < rows_sizes[:, :, None]
            rows_nodes = jnp.where(valid, rows_nodes, INT32_MAX)
            joined = join_gathered_keys(rows_nodes, rows_hi, rows_lo,
                                        rows_sizes, M, S)

            def loss_fn(p):
                logits = self.model.apply(
                    p, jnp.zeros((1, 1), jnp.float32), joined, None,
                    train=True, rngs={"dropout": rng})
                per = optax.sigmoid_binary_cross_entropy(logits, labels)
                return ((per * weights).sum()
                        / jnp.maximum(weights.sum(), 1.0))

            loss, grads = jax.value_and_grad(loss_fn)(params)
            grads = jax.lax.pmean(grads, "data")
            loss = jax.lax.pmean(loss, "data")
            updates, opt_state = self.optimizer.update(grads, opt_state,
                                                       params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss

        sharded = jax.shard_map(
            step_local, mesh=mesh,
            in_specs=(P(), P(), P("graph", None), P("graph", None),
                      P("graph", None), P("graph"), P(None, "data"),
                      P("data"), P("data"), P()),
            out_specs=(P(), P(), P()),
            check_vma=False,
        )
        return jax.jit(sharded)

    def __call__(self, params, opt_state, edges, labels, weights, rng):
        return self._step(params, opt_state, self.sspg.nodes,
                          self.sspg.khi, self.sspg.klo, self.sspg.sizes,
                          edges, labels, weights, rng)


class DistributedKeysHTrainStep:
    """Hyperedge (3-endpoint) variant of DistributedKeysTrainStep: the
    same owner-masked psum row gathers feed join_gathered_hkeys (the
    four u|w, w|u, v|w, w|v groups of train.py:48-72) and an HONet —
    multi-chip training for the higher-order CLI's model family."""

    def __init__(self, model, optimizer, mesh: Mesh,
                 sspg: ShardedSpGKeys):
        self.model = model
        self.optimizer = optimizer
        self.mesh = mesh
        self.sspg = sspg
        self._step = self._build()

    def _build(self):
        from surel_plus_tpu.ops.join import join_gathered_hkeys
        from surel_plus_tpu.ops.walk import INT32_MAX

        mesh, sspg = self.mesh, self.sspg
        rps = sspg.rows_per_shard
        M, S = sspg.num_walks, sspg.num_steps

        def step_local(params, opt_state, nodes, khi, klo, sizes,
                       hedges, labels, weights, rng):
            rows_nodes = dist_gather_rows(nodes, hedges, rps)
            rows_hi = dist_gather_rows(khi, hedges, rps)
            rows_lo = dist_gather_rows(klo, hedges, rps)
            rows_sizes = dist_gather_rows(sizes, hedges, rps)
            L = rows_nodes.shape[-1]
            slot = jnp.arange(L, dtype=jnp.int32)
            valid = slot[None, None, :] < rows_sizes[:, :, None]
            rows_nodes = jnp.where(valid, rows_nodes, INT32_MAX)
            joined = join_gathered_hkeys(rows_nodes, rows_hi, rows_lo,
                                         rows_sizes, M, S)

            def loss_fn(p):
                logits = self.model.apply(
                    p, jnp.zeros((1, 1), jnp.float32), joined, None,
                    train=True, rngs={"dropout": rng})
                per = optax.sigmoid_binary_cross_entropy(logits, labels)
                return ((per * weights).sum()
                        / jnp.maximum(weights.sum(), 1.0))

            loss, grads = jax.value_and_grad(loss_fn)(params)
            grads = jax.lax.pmean(grads, "data")
            loss = jax.lax.pmean(loss, "data")
            updates, opt_state = self.optimizer.update(grads, opt_state,
                                                       params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss

        sharded = jax.shard_map(
            step_local, mesh=mesh,
            in_specs=(P(), P(), P("graph", None), P("graph", None),
                      P("graph", None), P("graph"), P(None, "data"),
                      P("data"), P("data"), P()),
            out_specs=(P(), P(), P()),
            check_vma=False,
        )
        return jax.jit(sharded)

    def __call__(self, params, opt_state, hedges, labels, weights, rng):
        return self._step(params, opt_state, self.sspg.nodes,
                          self.sspg.khi, self.sspg.klo, self.sspg.sizes,
                          hedges, labels, weights, rng)


class DistributedKeysScorer:
    """(data x graph)-sharded inference over a row-sharded packed-key SpG
    — the eval mirror of DistributedKeysTrainStep (the reference's
    inference is half its wall-clock story: train.py:175-280, Table 4).
    Query rows are reconstructed with owner-masked psums over 'graph',
    joined locally, scored data-parallel; scores return replicated."""

    def __init__(self, model, mesh: Mesh, sspg: ShardedSpGKeys,
                 batch_size: int = 4096, join_gathered=None):
        """join_gathered: (rows_nodes, rows_hi, rows_lo, rows_sizes,
        M, S) -> JoinedBatch over pre-gathered endpoint rows; defaults
        to the 2-endpoint link join. Pass ops.join.join_gathered_hkeys
        (+ an HONet model) for distributed hyperedge eval — the
        reference's eval_model_horder (train.py:283-317) at mesh
        scale."""
        self.model = model
        self.mesh = mesh
        self.sspg = sspg
        self.join_gathered = join_gathered
        dp = mesh.shape["data"]
        self.batch_size = ((batch_size + dp - 1) // dp) * dp
        self._score_cache = {}

    def _build(self, nsteps: int):
        """One jitted program scoring the WHOLE split: a lax.scan over
        `nsteps` batches runs inside the shard_map, so an 86M-pair
        citation2-style eval costs one dispatch instead of one per batch
        (the per-batch host loop reintroduced the ~1 s/dispatch tunnel
        cost the single-device engine scans away — VERDICT r2 item 3).

        Each device scans its contiguous [Q, nsteps*bs/dp] column block;
        the final all_gather over 'data' reassembles global column order
        (shard-major == ascending global column for contiguous shards)."""
        if nsteps in self._score_cache:
            return self._score_cache[nsteps]
        from surel_plus_tpu.ops.join import join_gathered_keys
        from surel_plus_tpu.ops.walk import INT32_MAX

        mesh, sspg = self.mesh, self.sspg
        rps = sspg.rows_per_shard
        M, S = sspg.num_walks, sspg.num_steps
        join_gathered = self.join_gathered or join_gathered_keys

        def score_local(params, nodes, khi, klo, sizes, edges):
            # edges: [Q, nsteps * B_local] (this shard's column block)
            bsl = edges.shape[1] // nsteps

            def body(_, i):
                be = jax.lax.dynamic_slice_in_dim(edges, i * bsl, bsl,
                                                  axis=1)
                rows_nodes = dist_gather_rows(nodes, be, rps)
                rows_hi = dist_gather_rows(khi, be, rps)
                rows_lo = dist_gather_rows(klo, be, rps)
                rows_sizes = dist_gather_rows(sizes, be, rps)
                L = rows_nodes.shape[-1]
                slot = jnp.arange(L, dtype=jnp.int32)
                valid = slot[None, None, :] < rows_sizes[:, :, None]
                rows_nodes = jnp.where(valid, rows_nodes, INT32_MAX)
                joined = join_gathered(rows_nodes, rows_hi, rows_lo,
                                       rows_sizes, M, S)
                logits = self.model.apply(
                    params, jnp.zeros((1, 1), jnp.float32), joined, None,
                    train=False)
                return None, jax.nn.sigmoid(logits)

            _, out = jax.lax.scan(body, None,
                                  jnp.arange(nsteps, dtype=jnp.int32))
            # out: [nsteps, bsl] -> replicate in global column order
            allg = jax.lax.all_gather(out, "data")   # [dp, nsteps, bsl]
            return allg.reshape(-1)

        sharded = jax.shard_map(
            score_local, mesh=mesh,
            in_specs=(P(), P("graph", None), P("graph", None),
                      P("graph", None), P("graph"), P(None, "data")),
            out_specs=P(),
            check_vma=False,
        )
        self._score_cache[nsteps] = jax.jit(sharded)
        return self._score_cache[nsteps]

    def __call__(self, params, edges) -> jax.Array:
        """Score [Q, E] query edges (any E; padded to a whole number of
        batches). One device program per call. Returns scores [E]
        replicated."""
        edges = np.asarray(edges)
        E = edges.shape[1]
        bs = self.batch_size
        pad = (-E) % bs
        if pad:
            edges = np.concatenate(
                [edges, np.zeros((edges.shape[0], pad), edges.dtype)],
                axis=1)
        nsteps = (E + pad) // bs
        out = self._build(nsteps)(
            params, self.sspg.nodes, self.sspg.khi, self.sspg.klo,
            self.sspg.sizes, jnp.asarray(edges))
        return out[:E]


def evaluate_distributed(scorer: DistributedKeysScorer, params, inf_edge,
                         metric: str):
    """Sharded-mesh version of train.device.evaluate_device — identical
    result shapes (reference train.py:175-280); metrics computed from
    replicated score vectors."""
    import time

    from surel_plus_tpu.train.device import (device_auc, device_hits_at_k,
                                             device_mrr)

    def split_scores(split):
        pos_edge, neg_edge = inf_edge[split]
        return scorer(params, pos_edge), scorer(params, neg_edge)

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


class DistributedTrainStep:
    """Builds a jitted (data x graph)-sharded train step for `Net`-style
    models over a ShardedSpG."""

    def __init__(self, model, optimizer, mesh: Mesh, sspg: ShardedSpG,
                 join_fn: Callable = gather_join):
        self.model = model
        self.optimizer = optimizer
        self.mesh = mesh
        self.sspg = sspg
        self.join_fn = join_fn
        self._step = self._build()

    def _build(self):
        mesh, sspg = self.mesh, self.sspg
        rps = sspg.rows_per_shard

        def step_local(params, opt_state, nodes, eidx, sizes, enc,
                       edges, labels, weights, rng):
            # edges: [Q, B_local] global SpG row ids (data-sharded)
            rows_nodes = dist_gather_rows(nodes, edges, rps)
            rows_eidx = dist_gather_rows(eidx, edges, rps)
            rows_sizes = dist_gather_rows(sizes, edges, rps)
            joined = self._join_rows(rows_nodes, rows_eidx, rows_sizes)

            def loss_fn(p):
                logits = self.model.apply(p, enc, joined, None, train=True,
                                          rngs={"dropout": rng})
                per = optax.sigmoid_binary_cross_entropy(logits, labels)
                return ((per * weights).sum()
                        / jnp.maximum(weights.sum(), 1.0))

            loss, grads = jax.value_and_grad(loss_fn)(params)
            # average over data shards; graph shards hold identical grads
            grads = jax.lax.pmean(grads, "data")
            loss = jax.lax.pmean(loss, "data")
            updates, opt_state = self.optimizer.update(grads, opt_state,
                                                       params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss

        sharded = jax.shard_map(
            step_local, mesh=mesh,
            in_specs=(P(), P(), P("graph", None), P("graph", None),
                      P("graph"), P(), P(None, "data"), P("data"),
                      P("data"), P()),
            out_specs=(P(), P(), P()),
            check_vma=False,
        )
        return jax.jit(sharded)

    def _join_rows(self, rows_nodes, rows_eidx, rows_sizes) -> JoinedBatch:
        from surel_plus_tpu.ops.join import _cross_lookup
        from surel_plus_tpu.ops.walk import INT32_MAX

        # rows were psum-masked: padding slots carry INT32_MAX only on the
        # owner; reconstruct the mask from sizes instead of the sentinel.
        L = rows_nodes.shape[-1]
        slot = jnp.arange(L, dtype=jnp.int32)
        valid = slot[None, None, :] < rows_sizes[:, :, None]
        rows_nodes = jnp.where(valid, rows_nodes, INT32_MAX)
        nu, nv = rows_nodes[0], rows_nodes[1]
        eu, ev = rows_eidx[0] * valid[0], rows_eidx[1] * valid[1]
        cross_u = _cross_lookup(nu, nv, ev)
        cross_v = _cross_lookup(nv, nu, eu)
        eidx_out = jnp.stack([
            jnp.stack([eu, cross_u], axis=-1),
            jnp.stack([ev, cross_v], axis=-1),
        ])
        return JoinedBatch(eidx=eidx_out, mask=valid, sizes=rows_sizes)

    def __call__(self, params, opt_state, edges, labels, weights, rng):
        return self._step(params, opt_state, self.sspg.nodes,
                          self.sspg.eidx, self.sspg.sizes, self.sspg.enc,
                          edges, labels, weights, rng)
