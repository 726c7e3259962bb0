"""Worker process for the true multi-host test (tests/test_multihost.py).

Each process owns 4 virtual CPU devices; two processes form one logical
8-device mesh via jax.distributed. Partitioned frontier-exchange sampling
runs over the GLOBAL mesh; every process validates its addressable shards
against a locally-computed single-device reference, then the processes
jointly run one sharded train step and check the loss agrees.

Usage: python tests/_multihost_worker.py <coordinator> <nprocs> <pid>
"""

import sys

import numpy as np


def main():
    coordinator, nprocs, pid = (sys.argv[1], int(sys.argv[2]),
                                int(sys.argv[3]))
    # the axon plugin overrides platform selection programmatically —
    # JAX_PLATFORMS in the environment is NOT enough (CLAUDE.md)
    import jax

    jax.config.update("jax_platforms", "cpu")
    from surel_plus_tpu.parallel.partition import init_distributed

    init_distributed(coordinator_address=coordinator,
                     num_processes=nprocs, process_id=pid)
    import jax.numpy as jnp
    import optax

    assert jax.process_count() == nprocs
    assert jax.device_count() == 8, jax.device_count()
    assert jax.local_device_count() == 8 // nprocs

    from surel_plus_tpu.graph.synthetic import rmat_graph
    from surel_plus_tpu.models import Net
    from surel_plus_tpu.ops import walk as walk_ops
    from surel_plus_tpu.ops.join import make_keys_join
    from surel_plus_tpu.ops.sampler import shuffled_indices_for
    from surel_plus_tpu.parallel.dist import (
        DistributedKeysTrainStep, make_mesh, shard_spg_keys)
    from surel_plus_tpu.parallel.partition import (
        partition_csr, sample_gsets_partitioned)

    M, S, SEED = 7, 3, 23
    g = rmat_graph(512, 3000, seed=9)          # 512 % 8 == 0: no padding
    seeds = np.arange(g.num_nodes, dtype=np.int32)
    mesh = make_mesh()                         # global (data x graph) mesh
    ndev = jax.device_count()

    pcsr = partition_csr(g, ndev, seed=SEED)
    spgk = sample_gsets_partitioned(pcsr, seeds, M, S, mesh, seed=SEED)

    # ---- single-device reference on a local device ----
    indptr = jnp.asarray(g.indptr)
    indices = jnp.asarray(g.indices)
    shuffled = jnp.asarray(np.asarray(shuffled_indices_for(g, SEED)))
    nodes1, sizes1, hi1, lo1 = walk_ops.sample_block(
        indptr, indices, shuffled, jnp.asarray(seeds),
        jax.random.PRNGKey(SEED), num_walks=M, num_steps=S,
        bucket=M * S + 1)
    ref = {
        "nodes": np.asarray(nodes1), "sizes": np.asarray(sizes1),
        "hi": np.asarray(hi1), "lo": np.asarray(lo1),
    }

    # every process checks the shards IT holds — union covers the mesh
    checked = 0
    for name, arr in (("nodes", spgk.nodes), ("sizes", spgk.sizes),
                      ("hi", spgk.khi), ("lo", spgk.klo)):
        for shard in arr.addressable_shards:
            got = np.asarray(shard.data)
            want = ref[name][shard.index]
            np.testing.assert_array_equal(got, want)
            checked += 1
    assert checked > 0
    print(f"[proc {pid}] {checked} shards verified", flush=True)

    # ---- one sharded train step over the global mesh ----
    sspg = shard_spg_keys(spgk, mesh)
    model = Net(input_dim=S + 1, hidden_dim=16, dropout=0.0)
    rng = np.random.default_rng(0)             # same stream every process
    B = mesh.shape["data"] * 8
    edges = rng.integers(0, g.num_nodes, size=(2, B)).astype(np.int32)
    labels = (rng.random(B) < 0.5).astype(np.float32)

    kjoin = make_keys_join(M, S)
    joined = kjoin(jnp.asarray(ref["nodes"]),
                   jnp.asarray(ref["hi"]), jnp.asarray(ref["lo"]),
                   jnp.asarray(ref["sizes"]), jnp.asarray(edges))
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 1), jnp.float32), joined)
    logits = model.apply(params, jnp.zeros((1, 1), jnp.float32), joined,
                         None, train=False)
    want_loss = float(optax.sigmoid_binary_cross_entropy(
        logits, jnp.asarray(labels)).mean())

    opt = optax.adam(1e-3)
    opt_state = opt.init(params)
    step = DistributedKeysTrainStep(model, opt, mesh, sspg)
    _, _, loss = step(params, opt_state, edges, labels,
                      np.ones(B, np.float32), jax.random.PRNGKey(1))
    loss = float(loss)
    assert np.isclose(loss, want_loss, rtol=1e-5), (loss, want_loss)
    print(f"[proc {pid}] train step loss {loss:.6f} == single-device "
          f"{want_loss:.6f} OK", flush=True)


if __name__ == "__main__":
    main()
