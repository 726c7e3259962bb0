"""Edge-partitioned multi-device sampling: bit-exact parity with the
single-device kernel, and the partitioned->sharded-train pipeline."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from surel_plus_tpu.graph.synthetic import rmat_graph
from surel_plus_tpu.ops import walk as walk_ops
from surel_plus_tpu.ops.sampler import (device_graph, shuffled_indices_for)
from surel_plus_tpu.parallel.dist import make_mesh
from surel_plus_tpu.parallel.partition import (
    PartitionedCSR, partition_csr, sample_gsets_partitioned)

M, S = 11, 3
SEED = 17


@pytest.fixture(scope="module")
def setup():
    g = rmat_graph(500, 3000, seed=5)
    seeds = np.arange(g.num_nodes, dtype=np.int32)
    return g, seeds


def _single_device(g, seeds, key_seed):
    n = len(seeds)
    ndev = len(jax.devices())
    per = (n + ndev - 1) // ndev
    n_pad = per * ndev
    seeds_pad = np.concatenate([seeds, np.zeros(n_pad - n, np.int32)])
    indptr, indices = device_graph(g)
    shuffled = shuffled_indices_for(g, key_seed)
    # reproduce the partitioned key discipline: one block, global bits
    nodes, sizes, hi, lo = walk_ops.sample_block(
        indptr, indices, shuffled, jnp.asarray(seeds_pad),
        jax.random.PRNGKey(key_seed), num_walks=M, num_steps=S,
        bucket=M * S + 1)
    return (np.asarray(nodes)[:n], np.asarray(sizes)[:n],
            np.asarray(hi)[:n], np.asarray(lo)[:n])


def test_partition_csr_roundtrip(setup):
    g, _ = setup
    for G in (2, 8):
        p = partition_csr(g, G, seed=SEED)
        assert p.num_edges == g.num_edges
        rps = p.rows_per_shard
        for u in (0, 123, g.num_nodes - 1):
            sh, lid = u // rps, u % rps
            lo_i = p.indptr[sh, lid]
            hi_i = p.indptr[sh, lid + 1]
            np.testing.assert_array_equal(
                p.indices[sh, lo_i:hi_i], g.neighbors(u))


def test_partitioned_matches_single_device(setup):
    """Frontier-exchange sampling over 8 partitions == one-device kernel,
    bit for bit (same key, same shuffle)."""
    g, seeds = setup
    mesh = make_mesh()
    ndev = len(jax.devices())
    pcsr = partition_csr(g, ndev, seed=SEED)
    spgk = sample_gsets_partitioned(pcsr, seeds, M, S, mesh, seed=SEED)

    nodes1, sizes1, hi1, lo1 = _single_device(g, seeds, SEED)
    np.testing.assert_array_equal(np.asarray(spgk.sizes), sizes1)
    np.testing.assert_array_equal(np.asarray(spgk.nodes), nodes1)
    np.testing.assert_array_equal(np.asarray(spgk.khi), hi1)
    np.testing.assert_array_equal(np.asarray(spgk.klo), lo1)


def test_partitioned_train_step_matches_single(setup):
    """Partitioned sampling feeds the sharded train step; loss matches a
    single-device trainer on the same SpG exactly."""
    import optax

    from surel_plus_tpu.models import Net
    from surel_plus_tpu.parallel.dist import (
        DistributedKeysTrainStep, shard_spg_keys)

    g, seeds = setup
    mesh = make_mesh()
    ndev = len(jax.devices())
    pcsr = partition_csr(g, ndev, seed=SEED)
    spgk = sample_gsets_partitioned(pcsr, seeds, M, S, mesh, seed=SEED)
    sspg = shard_spg_keys(spgk, mesh)

    model = Net(input_dim=S + 1, hidden_dim=16, dropout=0.0)
    opt = optax.adam(1e-3)
    step = DistributedKeysTrainStep(model, opt, mesh, sspg)

    rng = np.random.default_rng(0)
    B = mesh.shape["data"] * 16
    edges = rng.integers(0, g.num_nodes, size=(2, B)).astype(np.int32)
    labels = (rng.random(B) < 0.5).astype(np.float32)
    weights = np.ones(B, np.float32)

    from surel_plus_tpu.ops.join import make_keys_join
    join = make_keys_join(M, S)
    nodes = jnp.asarray(np.asarray(spgk.nodes))
    khi = jnp.asarray(np.asarray(spgk.khi))
    klo = jnp.asarray(np.asarray(spgk.klo))
    sizes = jnp.asarray(np.asarray(spgk.sizes))
    joined = join(nodes, khi, klo, sizes, jnp.asarray(edges))
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 1), jnp.float32), joined)
    opt_state = opt.init(params)

    def ref_loss(p):
        logits = model.apply(p, jnp.zeros((1, 1), jnp.float32), joined,
                             None, train=False)
        per = optax.sigmoid_binary_cross_entropy(
            logits, jnp.asarray(labels))
        return per.mean()

    want = float(ref_loss(params))
    _, _, loss = step(params, opt_state, jnp.asarray(edges),
                      jnp.asarray(labels), jnp.asarray(weights),
                      jax.random.PRNGKey(1))
    np.testing.assert_allclose(float(loss), want, rtol=1e-5)


def test_grouped_matches_single_device(setup):
    """Replica-group sampling (graph over K devices, seeds across G/K
    groups) == one-device kernel bit for bit, for K in {1, 2, 4}."""
    from surel_plus_tpu.parallel.partition import sample_gsets_grouped

    g, seeds = setup
    mesh = make_mesh()
    nodes1, sizes1, hi1, lo1 = _single_device(g, seeds, SEED)
    for K in (1, 2, 4):
        spgk = sample_gsets_grouped(g, seeds, M, S, mesh, group_size=K,
                                    seed=SEED)
        np.testing.assert_array_equal(np.asarray(spgk.sizes), sizes1)
        np.testing.assert_array_equal(np.asarray(spgk.nodes), nodes1)
        np.testing.assert_array_equal(np.asarray(spgk.khi), hi1)
        np.testing.assert_array_equal(np.asarray(spgk.klo), lo1)


def test_capacity_routing_matches_probe(setup):
    """The capacity-routed transport gives identical results to the
    broadcast probe (and to the single-device kernel)."""
    g, seeds = setup
    mesh = make_mesh()
    ndev = len(jax.devices())
    pcsr = partition_csr(g, ndev, seed=SEED)
    nodes1, sizes1, hi1, lo1 = _single_device(g, seeds, SEED)
    spgk = sample_gsets_partitioned(pcsr, seeds, M, S, mesh, seed=SEED,
                                    routing="capacity")
    np.testing.assert_array_equal(np.asarray(spgk.sizes), sizes1)
    np.testing.assert_array_equal(np.asarray(spgk.nodes), nodes1)
    np.testing.assert_array_equal(np.asarray(spgk.khi), hi1)
    np.testing.assert_array_equal(np.asarray(spgk.klo), lo1)

def test_bare_exchange_matches_single_device(setup):
    """The bare-pick exchange (edge_tables=False: three per-element owner
    gathers per request, the memory-lean transport) stays bit-exact too."""
    g, seeds = setup
    mesh = make_mesh()
    ndev = len(jax.devices())
    pcsr = partition_csr(g, ndev, seed=SEED, edge_tables=False)
    assert pcsr.etab is None
    nodes1, sizes1, hi1, lo1 = _single_device(g, seeds, SEED)
    for routing in ("probe", "capacity"):
        spgk = sample_gsets_partitioned(pcsr, seeds, M, S, mesh,
                                        seed=SEED, routing=routing)
        np.testing.assert_array_equal(np.asarray(spgk.sizes), sizes1)
        np.testing.assert_array_equal(np.asarray(spgk.nodes), nodes1)
        np.testing.assert_array_equal(np.asarray(spgk.khi), hi1)
        np.testing.assert_array_equal(np.asarray(spgk.klo), lo1)


def test_capacity_overflow_fallback_exercised(setup):
    """Force the capacity transport's overflow fallback (the lax.cond
    probe branch in _route_step/_route_step_rows) and assert it is still
    bit-exact vs the single-device kernel.

    capacity_slack=0.05 makes cap = ceil(0.05*R/G) < R/G, so by
    pigeonhole at least one destination shard overflows its send buffer
    on EVERY exchange step — the fallback branch, never hit at the
    default 1.25 slack (binomially negligible overflow), runs for the
    whole walk. A wrong fallback would corrupt samples exactly when
    frontier load is most skewed (VERDICT r2, weak item 2)."""
    g, seeds = setup
    mesh = make_mesh()
    ndev = len(jax.devices())
    nodes1, sizes1, hi1, lo1 = _single_device(g, seeds, SEED)
    for edge_tables in (True, False):  # rows (_route_step_rows) and
        pcsr = partition_csr(g, ndev, seed=SEED,  # bare (_route_step)
                             edge_tables=edge_tables)
        spgk = sample_gsets_partitioned(pcsr, seeds, M, S, mesh,
                                        seed=SEED, routing="capacity",
                                        capacity_slack=0.05)
        np.testing.assert_array_equal(np.asarray(spgk.sizes), sizes1)
        np.testing.assert_array_equal(np.asarray(spgk.nodes), nodes1)
        np.testing.assert_array_equal(np.asarray(spgk.khi), hi1)
        np.testing.assert_array_equal(np.asarray(spgk.klo), lo1)
