"""A/B the walk (start,deg) row-gather fusion on TPU.

Run twice, sequentially (ONE TPU process at a time):
  SUREL_WALK_FUSION=0 python scripts/probe_walk_fusion.py   # baseline
  SUREL_WALK_FUSION=1 python scripts/probe_walk_fusion.py   # fused

Reports warm per-block walk+build time and sets/s at the bench workload
(250k nodes, M=100, S'=3, block 65536).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np  # noqa: E402

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax_bench_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from surel_plus_tpu.graph.synthetic import rmat_graph  # noqa: E402
from surel_plus_tpu.ops import walk as walk_ops  # noqa: E402
from surel_plus_tpu.ops.sampler import (  # noqa: E402
    device_graph, sample_gsets_device_keys, shuffled_indices_for)


def main():
    fusion = walk_ops._FUSE_START_DEG
    num_nodes, num_edges = 250_000, 2_500_000
    M, S, block = 100, 3, 65536
    print(f"fusion={'ON' if fusion else 'OFF'} device="
          f"{jax.devices()[0].device_kind}", flush=True)

    g = rmat_graph(num_nodes, num_edges, seed=0)
    seeds = np.arange(num_nodes, dtype=np.int32)

    # cold (compile)
    t0 = time.time()
    spgk = sample_gsets_device_keys(g, seeds, num_walks=M, num_steps=S,
                                    seed=0, block_size=block)
    _ = int(spgk.sizes.max())
    print(f"cold: {time.time()-t0:.1f}s", flush=True)

    for rep in range(3):
        t0 = time.time()
        spgk = sample_gsets_device_keys(g, seeds, num_walks=M, num_steps=S,
                                        seed=rep + 1, block_size=block)
        _ = int(spgk.sizes.max())
        dt = time.time() - t0
        print(f"warm[{rep}]: {dt:.2f}s -> {num_nodes/dt:,.0f} sets/s "
              f"({num_nodes*M*S/dt/1e6:.1f}M walked edges/s)", flush=True)


if __name__ == "__main__":
    main()
