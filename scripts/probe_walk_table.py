"""A/B the edge-table walk (one row gather per step) on TPU.

Single process, both variants (the jit caches are distinct: the table
variant has two extra array operands). Bench workload: 250k nodes, E=2.5M,
M=100, S'=3, block 65536.
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
from surel_plus_tpu.ops.sampler import sample_gsets_device_keys  # noqa: E402


def run(tag, g, seeds, M, S, block, reps=3):
    t0 = time.time()
    spgk = sample_gsets_device_keys(g, seeds, num_walks=M, num_steps=S,
                                    seed=0, block_size=block)
    _ = int(spgk.sizes.max())  # host pull = tunnel sync
    print(f"{tag} cold: {time.time()-t0:.1f}s", flush=True)
    n = len(seeds)
    best = None
    for rep in range(reps):
        t0 = time.time()
        spgk = sample_gsets_device_keys(g, seeds, num_walks=M, num_steps=S,
                                        seed=rep + 1, shuffle_seed=0,
                                        block_size=block)
        _ = int(spgk.sizes.max())
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
        print(f"{tag} warm[{rep}]: {dt:.2f}s -> {n/dt:,.0f} sets/s "
              f"({n*M*S/dt/1e6:.1f}M walked edges/s)", flush=True)
    return best


def main():
    num_nodes, num_edges = 250_000, 2_500_000
    M, S, block = 100, 3, 65536
    print(f"device={jax.devices()[0].device_kind}", flush=True)
    g = rmat_graph(num_nodes, num_edges, seed=0)
    seeds = np.arange(num_nodes, dtype=np.int32)

    walk_ops._EDGE_TABLE = False
    base = run("baseline ", g, seeds, M, S, block)
    walk_ops._EDGE_TABLE = True
    tab = run("edgetable", g, seeds, M, S, block)
    print(f"speedup x{base/tab:.2f}  ({num_nodes/base:,.0f} -> "
          f"{num_nodes/tab:,.0f} sets/s)", flush=True)


if __name__ == "__main__":
    main()
