"""Virtual-mesh timing of the batched DistributedKeysScorer (r3):
one lax.scan dispatch per split vs a host loop issuing one program per
batch. CPU 8-device mesh — the interesting number is DISPATCH COUNT
(each dispatch costs ~0.5-1.3 s on the tunneled TPU link), the CPU
wall-clock is a sanity check that the scan program itself isn't slower.

XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    python scripts/probe_dist_scorer.py
"""
import os
import sys
import time

os.environ.setdefault("XLA_FLAGS",
                      "--xla_force_host_platform_device_count=8")
sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.sharding import Mesh  # noqa: E402

from surel_plus_tpu.graph.synthetic import rmat_graph  # noqa: E402
from surel_plus_tpu.models import Net  # noqa: E402
from surel_plus_tpu.ops.sampler import sample_gsets_device_keys  # noqa
from surel_plus_tpu.parallel.dist import (  # noqa: E402
    DistributedKeysScorer, shard_spg_keys)


def main():
    devs = np.array(jax.devices()).reshape(4, 2)
    mesh = Mesh(devs, ("data", "graph"))
    g = rmat_graph(20_000, 200_000, seed=0)
    spgk = sample_gsets_device_keys(
        g, np.arange(20_000, dtype=np.int32), num_walks=25, num_steps=3,
        seed=0, block_size=20_000)
    sspg = shard_spg_keys(spgk, mesh)
    model = Net(input_dim=4, hidden_dim=32, aggrs="mean", dropout=0.0)

    rng = np.random.default_rng(0)
    BS, NB = 512, 64
    edges = rng.integers(0, 20_000, size=(2, BS * NB)).astype(np.int32)
    scorer = DistributedKeysScorer(model, mesh, sspg, batch_size=BS)
    from surel_plus_tpu.ops.join import make_keys_join
    kjoin = make_keys_join(25, 3)
    jb = kjoin(spgk.nodes, spgk.khi, spgk.klo, spgk.sizes,
               jnp.asarray(edges[:, :BS]))
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 1), jnp.float32), jb)

    # one-dispatch scan program (current implementation)
    _ = np.asarray(scorer(params, edges))           # compile
    t0 = time.time()
    s_scan = np.asarray(scorer(params, edges))
    dt_scan = time.time() - t0

    # per-batch host loop (the r2 implementation this replaced)
    _ = np.asarray(scorer(params, edges[:, :BS]))   # compile batch prog
    t0 = time.time()
    parts = [np.asarray(scorer(params, edges[:, i * BS:(i + 1) * BS]))
             for i in range(NB)]
    dt_loop = time.time() - t0
    s_loop = np.concatenate(parts)

    assert np.allclose(s_scan, s_loop, rtol=1e-5, atol=1e-6)
    print(f"{BS * NB} queries on a 4x2 virtual mesh:")
    print(f"  scan (1 dispatch):    {dt_scan:.2f}s")
    print(f"  loop ({NB} dispatches): {dt_loop:.2f}s  "
          f"(+{NB - 1} dispatch roundtrips on a real tunneled link: "
          f"~{0.9 * (NB - 1):.0f}s at 0.9 s each)")


if __name__ == "__main__":
    main()
