"""Multi-device tests on the virtual 8-device CPU mesh: sharded SpG row
gather correctness and the distributed train step vs the single-device
step."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from surel_plus_tpu.graph.synthetic import rmat_graph
from surel_plus_tpu.models import Net
from surel_plus_tpu.ops.join import gather_join
from surel_plus_tpu.ops.sampler import sample_gsets
from surel_plus_tpu.parallel.dist import (
    DistributedTrainStep, make_mesh, shard_spg)


@pytest.fixture(scope="module")
def setup():
    assert jax.device_count() >= 8, "conftest must provide 8 CPU devices"
    g = rmat_graph(200, 1000, seed=0)
    seeds = np.arange(200, dtype=np.int32)
    spg = sample_gsets(g, seeds, num_walks=8, num_steps=2, seed=1,
                       block_size=200)
    model = Net(input_dim=3, hidden_dim=16, aggrs="mean", dropout=0.0)
    return g, spg, model


def test_mesh_shapes():
    mesh = make_mesh(8)
    assert mesh.shape == {"data": 4, "graph": 2}
    mesh = make_mesh(8, graph_axis=4)
    assert mesh.shape == {"data": 2, "graph": 4}


def test_distributed_step_matches_single(setup):
    g, spg, model = setup
    mesh = make_mesh(8)
    sspg = shard_spg(spg, mesh)

    B = 32
    rng = np.random.default_rng(0)
    edges = rng.integers(0, 200, size=(2, B)).astype(np.int32)
    labels = (np.arange(B) % 2).astype(np.float32)
    weights = np.ones(B, np.float32)

    dev = spg.device()
    joined = gather_join(dev.nodes, dev.eidx, dev.sizes, jnp.asarray(edges))
    params = model.init(jax.random.PRNGKey(0), dev.enc, joined)
    optimizer = optax.chain(optax.clip_by_global_norm(1.0),
                            optax.adam(1e-2))
    opt_state = optimizer.init(params)

    # single-device reference step
    def single_step(params, opt_state):
        def loss_fn(p):
            logits = model.apply(p, dev.enc, joined, None, train=False)
            per = optax.sigmoid_binary_cross_entropy(
                logits, jnp.asarray(labels))
            return per.mean()
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    p1, _, loss1 = single_step(params, opt_state)

    step = DistributedTrainStep(model, optimizer, mesh, sspg)
    p2, _, loss2 = step(params, opt_state, jnp.asarray(edges),
                        jnp.asarray(labels), jnp.asarray(weights),
                        jax.random.PRNGKey(9))

    assert np.isclose(float(loss1), float(loss2), rtol=1e-5), \
        (float(loss1), float(loss2))
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)


def test_distributed_keys_step(setup):
    """Keys-layout sharded step trains and produces a finite loss equal to
    the single-device keys trainer's first-step loss."""
    from surel_plus_tpu.ops.join import make_keys_join
    from surel_plus_tpu.ops.sampler import sample_gsets_device_keys
    from surel_plus_tpu.parallel.dist import (
        DistributedKeysTrainStep, shard_spg_keys)

    g, _, _ = setup
    spgk = sample_gsets_device_keys(g, np.arange(200, dtype=np.int32),
                                    num_walks=8, num_steps=2, seed=1,
                                    block_size=200)
    mesh = make_mesh(8)
    sspg = shard_spg_keys(spgk, mesh)
    model = Net(input_dim=3, hidden_dim=16, aggrs="mean", dropout=0.0)

    B = 32
    rng = np.random.default_rng(0)
    edges = rng.integers(0, 200, size=(2, B)).astype(np.int32)
    labels = (np.arange(B) % 2).astype(np.float32)

    kjoin = make_keys_join(8, 2)
    joined = kjoin(spgk.nodes, spgk.khi, spgk.klo, spgk.sizes,
                   jnp.asarray(edges))
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 1), jnp.float32), joined)
    optimizer = optax.chain(optax.clip_by_global_norm(1.0),
                            optax.adam(1e-2))
    opt_state = optimizer.init(params)

    # single-device reference loss
    logits = model.apply(params, jnp.zeros((1, 1), jnp.float32), joined)
    want = float(optax.sigmoid_binary_cross_entropy(
        logits, jnp.asarray(labels)).mean())

    step = DistributedKeysTrainStep(model, optimizer, mesh, sspg)
    p2, _, loss = step(params, opt_state, jnp.asarray(edges),
                       jnp.asarray(labels),
                       jnp.ones((B,), jnp.float32), jax.random.PRNGKey(9))
    assert np.isclose(float(loss), want, rtol=1e-5), (float(loss), want)


def test_a2a_gather_matches_psum(setup):
    from jax.sharding import PartitionSpec as P

    from surel_plus_tpu.parallel.dist import (
        dist_gather_rows, dist_gather_rows_a2a, shard_spg)

    g, spg, _ = setup
    mesh = make_mesh(8, graph_axis=4)
    sspg = shard_spg(spg, mesh)
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(0, 200, size=(2, 16)).astype(np.int32))

    def run(fn):
        def local(nodes, ids):
            return fn(nodes, ids, sspg.rows_per_shard)
        return jax.jit(jax.shard_map(
            local, mesh=mesh,
            in_specs=(P("graph", None), P()),
            out_specs=P(), check_vma=False))(sspg.nodes, ids)

    np.testing.assert_array_equal(np.asarray(run(dist_gather_rows)),
                                  np.asarray(run(dist_gather_rows_a2a)))


def test_sharded_sampling(setup):
    """Seed-sharded sampling produces valid sets on every shard (root
    membership + mass conservation per seed)."""
    from surel_plus_tpu.ops.join import unpack_key_features
    from surel_plus_tpu.parallel.dist import sample_gsets_sharded

    g, _, _ = setup
    mesh = make_mesh(8)
    M, S = 8, 2
    seeds = np.arange(200, dtype=np.int32)
    spgk = sample_gsets_sharded(g, seeds, M, S, mesh, seed=3)
    nodes = np.asarray(spgk.nodes)
    sizes = np.asarray(spgk.sizes)
    feats = np.asarray(unpack_key_features(spgk.khi, spgk.klo, M, S)) * M
    assert nodes.shape == (200, M * S + 1)
    valid = np.arange(nodes.shape[1])[None, :] < sizes[:, None]
    # root in its own set with count M at col 0
    root_pos = np.argmax(nodes == seeds[:, None], axis=1)
    assert np.all(nodes[np.arange(200), root_pos] == seeds)
    assert np.allclose(feats[np.arange(200), root_pos, 0], M)
    # landing mass per column == M
    per_seed = (feats * valid[:, :, None]).sum(axis=1)
    assert np.allclose(per_seed, M)


def test_graft_entry_dryrun():
    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import __graft_entry__ as ge
    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert np.all(np.isfinite(np.asarray(out)))
    ge.dryrun_multichip(8)


def test_distributed_scorer_matches_single(setup):
    """Sharded-mesh inference == single-device keys scoring exactly, and
    evaluate_distributed produces the evaluate_device result shapes."""
    from surel_plus_tpu.ops.join import make_keys_join
    from surel_plus_tpu.ops.sampler import sample_gsets_device_keys
    from surel_plus_tpu.parallel.dist import (
        DistributedKeysScorer, evaluate_distributed, shard_spg_keys)

    g, _, _ = setup
    spgk = sample_gsets_device_keys(g, np.arange(200, dtype=np.int32),
                                    num_walks=8, num_steps=2, seed=1,
                                    block_size=200)
    mesh = make_mesh(8)
    sspg = shard_spg_keys(spgk, mesh)
    model = Net(input_dim=3, hidden_dim=16, aggrs="mean", dropout=0.0)

    rng = np.random.default_rng(3)
    E = 100  # not a multiple of the padded batch — exercises padding
    edges = rng.integers(0, 200, size=(2, E)).astype(np.int32)

    kjoin = make_keys_join(8, 2)
    joined = kjoin(spgk.nodes, spgk.khi, spgk.klo, spgk.sizes,
                   jnp.asarray(edges))
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 1), jnp.float32), joined)
    want = np.asarray(jax.nn.sigmoid(model.apply(
        params, jnp.zeros((1, 1), jnp.float32), joined, None,
        train=False)))

    scorer = DistributedKeysScorer(model, mesh, sspg, batch_size=64)
    got = np.asarray(scorer(params, edges))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)

    inf_edge = {
        "valid": (edges[:, :40], edges[:, 40:80]),
        "test": (edges[:, :40], edges[:, 40:80]),
    }
    res, t = evaluate_distributed(scorer, params, inf_edge, "Hits@50")
    assert set(res) == {"Hits@10", "Hits@20", "Hits@50", "Hits@100"}
    res_mrr, _ = evaluate_distributed(scorer, params, inf_edge, "MRR")
    assert len(res_mrr) == 3


def test_distributed_keys_step_fused(setup):
    """The Pallas fused hidden kernel composes with shard_map: the
    sharded step with fused_hidden=True (interpret mode on CPU) matches
    the single-device unfused loss exactly."""
    from surel_plus_tpu.ops.join import make_keys_join
    from surel_plus_tpu.ops.sampler import sample_gsets_device_keys
    from surel_plus_tpu.parallel.dist import (
        DistributedKeysTrainStep, shard_spg_keys)

    g, _, _ = setup
    spgk = sample_gsets_device_keys(g, np.arange(200, dtype=np.int32),
                                    num_walks=8, num_steps=2, seed=1,
                                    block_size=200)
    mesh = make_mesh(8)
    sspg = shard_spg_keys(spgk, mesh)
    model = Net(input_dim=3, hidden_dim=16, aggrs="mean", dropout=0.0,
                fused_hidden=True, key_layout=(8, 2))

    B = 32
    rng = np.random.default_rng(0)
    edges = rng.integers(0, 200, size=(2, B)).astype(np.int32)
    labels = (np.arange(B) % 2).astype(np.float32)

    kjoin = make_keys_join(8, 2)
    joined = kjoin(spgk.nodes, spgk.khi, spgk.klo, spgk.sizes,
                   jnp.asarray(edges))
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 1), jnp.float32), joined)
    ref_model = model.clone(fused_hidden=False)
    logits = ref_model.apply(params, jnp.zeros((1, 1), jnp.float32),
                             joined)
    want = float(optax.sigmoid_binary_cross_entropy(
        logits, jnp.asarray(labels)).mean())

    optimizer = optax.chain(optax.clip_by_global_norm(1.0),
                            optax.adam(1e-2))
    step = DistributedKeysTrainStep(model, optimizer, mesh, sspg)
    _, _, loss = step(params, optimizer.init(params), jnp.asarray(edges),
                      jnp.asarray(labels), jnp.ones((B,), jnp.float32),
                      jax.random.PRNGKey(9))
    assert np.isclose(float(loss), want, rtol=1e-5), (float(loss), want)


@pytest.mark.parametrize("aggrs", ["attn", "lstm"])
def test_distributed_keys_step_fused_aggregators(setup, aggrs):
    """The attn-pool / keys-LSTM fused kernels compose with shard_map:
    the sharded step matches the single-device unfused loss."""
    from surel_plus_tpu.ops.join import make_keys_join
    from surel_plus_tpu.ops.sampler import sample_gsets_device_keys
    from surel_plus_tpu.parallel.dist import (
        DistributedKeysTrainStep, shard_spg_keys)

    g, _, _ = setup
    spgk = sample_gsets_device_keys(g, np.arange(200, dtype=np.int32),
                                    num_walks=8, num_steps=2, seed=1,
                                    block_size=200)
    mesh = make_mesh(8)
    sspg = shard_spg_keys(spgk, mesh)
    model = Net(input_dim=3, hidden_dim=16, aggrs=aggrs, dropout=0.0,
                fused_hidden=True, key_layout=(8, 2))

    B = 32
    rng = np.random.default_rng(0)
    edges = rng.integers(0, 200, size=(2, B)).astype(np.int32)
    labels = (np.arange(B) % 2).astype(np.float32)

    kjoin = make_keys_join(8, 2)
    joined = kjoin(spgk.nodes, spgk.khi, spgk.klo, spgk.sizes,
                   jnp.asarray(edges))
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 1), jnp.float32), joined)
    ref_model = model.clone(fused_hidden=False)
    logits = ref_model.apply(params, jnp.zeros((1, 1), jnp.float32),
                             joined)
    want = float(optax.sigmoid_binary_cross_entropy(
        logits, jnp.asarray(labels)).mean())

    optimizer = optax.chain(optax.clip_by_global_norm(1.0),
                            optax.adam(1e-2))
    step = DistributedKeysTrainStep(model, optimizer, mesh, sspg)
    _, _, loss = step(params, optimizer.init(params), jnp.asarray(edges),
                      jnp.asarray(labels), jnp.ones((B,), jnp.float32),
                      jax.random.PRNGKey(9))
    assert np.isclose(float(loss), want, rtol=1e-4), (float(loss), want)


def test_distributed_hyperedge_step_matches_single(setup):
    """DistributedKeysHTrainStep (3-endpoint psum gathers ->
    join_gathered_hkeys -> HONet) reproduces the single-device
    hyperedge loss exactly on the virtual mesh."""
    from surel_plus_tpu.models import HONet
    from surel_plus_tpu.ops.join import make_keys_hjoin
    from surel_plus_tpu.ops.sampler import sample_gsets_device_keys
    from surel_plus_tpu.parallel.dist import (
        DistributedKeysHTrainStep, shard_spg_keys)

    g, _, _ = setup
    spgk = sample_gsets_device_keys(g, np.arange(200, dtype=np.int32),
                                    num_walks=8, num_steps=2, seed=1,
                                    block_size=200)
    mesh = make_mesh(8)
    sspg = shard_spg_keys(spgk, mesh)
    honet = HONet(input_dim=3, hidden_dim=16, dropout=0.0,
                  key_layout=(8, 2))

    B = 32
    rng = np.random.default_rng(0)
    hedges = rng.integers(0, 200, size=(3, B)).astype(np.int32)
    labels = (np.arange(B) % 2).astype(np.float32)

    hjoin = make_keys_hjoin(8, 2)
    joined = hjoin(spgk.nodes, spgk.khi, spgk.klo, spgk.sizes,
                   jnp.asarray(hedges))
    params = honet.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 1), jnp.float32), joined)
    logits = honet.apply(params, jnp.zeros((1, 1), jnp.float32), joined)
    want = float(optax.sigmoid_binary_cross_entropy(
        logits, jnp.asarray(labels)).mean())

    optimizer = optax.chain(optax.clip_by_global_norm(1.0),
                            optax.adam(1e-2))
    step = DistributedKeysHTrainStep(honet, optimizer, mesh, sspg)
    p2, _, loss = step(params, optimizer.init(params),
                       jnp.asarray(hedges), jnp.asarray(labels),
                       jnp.ones((B,), jnp.float32), jax.random.PRNGKey(9))
    assert np.isclose(float(loss), want, rtol=1e-5), (float(loss), want)
    # params actually moved
    moved = any(
        not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(p2)))
    assert moved


def test_distributed_hyperedge_scorer_matches_single(setup):
    """DistributedKeysScorer with join_gathered_hkeys reproduces the
    single-device HONet scores exactly — distributed eval_model_horder
    (reference train.py:283-317) at mesh scale."""
    from surel_plus_tpu.models import HONet
    from surel_plus_tpu.ops.join import join_gathered_hkeys, make_keys_hjoin
    from surel_plus_tpu.ops.sampler import sample_gsets_device_keys
    from surel_plus_tpu.parallel.dist import (
        DistributedKeysScorer, shard_spg_keys)

    g, _, _ = setup
    spgk = sample_gsets_device_keys(g, np.arange(200, dtype=np.int32),
                                    num_walks=8, num_steps=2, seed=1,
                                    block_size=200)
    mesh = make_mesh(8)
    sspg = shard_spg_keys(spgk, mesh)
    honet = HONet(input_dim=3, hidden_dim=16, dropout=0.0,
                  key_layout=(8, 2))

    rng = np.random.default_rng(2)
    E = 100   # not a multiple of the batch -> exercises padding
    hedges = rng.integers(0, 200, size=(3, E)).astype(np.int32)
    hjoin = make_keys_hjoin(8, 2)
    joined = hjoin(spgk.nodes, spgk.khi, spgk.klo, spgk.sizes,
                   jnp.asarray(hedges))
    params = honet.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 1), jnp.float32), joined)
    want = jax.nn.sigmoid(honet.apply(
        params, jnp.zeros((1, 1), jnp.float32), joined))

    scorer = DistributedKeysScorer(honet, mesh, sspg, batch_size=32,
                                   join_gathered=join_gathered_hkeys)
    got = scorer(params, hedges)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-6)
