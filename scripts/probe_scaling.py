"""Scaling probe: seed-parallel vs partitioned sampling and the sharded
train step across mesh sizes on the virtual CPU mesh (and single-chip
TPU when run under the default platform).

Virtual-mesh caveat: N virtual devices share this box's physical cores,
so absolute speedups saturate at the core count; the meaningful numbers
are (a) strong-scaling wall time for FIXED total work as the mesh grows
(perfect = flat per-device cost x N-fold capacity) and (b) the overhead
factor of partitioned (frontier-exchange) sampling vs replicated
seed-parallel sampling at the same mesh size — the price of graphs
beyond one device's HBM.

Usage: [JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8]
       python scripts/probe_scaling.py [N ...]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np

import jax

if os.environ.get("SUREL_PLATFORM"):  # axon overrides env JAX_PLATFORMS
    jax.config.update("jax_platforms", os.environ["SUREL_PLATFORM"])

from surel_plus_tpu.graph.synthetic import rmat_graph
from surel_plus_tpu.parallel.dist import make_mesh, sample_gsets_sharded
from surel_plus_tpu.parallel.partition import (partition_csr,
                                               sample_gsets_partitioned)

M, S = 50, 3
N_NODES, N_EDGES = 20000, 120000
SEED = 7


def pull(x):
    return float(np.asarray(x).reshape(-1)[0])


def time_fn(fn, warmup=1, iters=3):
    for _ in range(warmup):
        r = fn()
    t0 = time.time()
    for _ in range(iters):
        r = fn()
    pull(r[0] if isinstance(r, tuple) else r)
    return (time.time() - t0) / iters


def main():
    ns = [int(a) for a in sys.argv[1:]] or [1, 2, 4, 8]
    g = rmat_graph(N_NODES, N_EDGES, seed=3)
    seeds = np.arange(N_NODES, dtype=np.int32)
    total_devices = len(jax.devices())
    edges_walked = N_NODES * M * S

    print(f"devices={total_devices} graph N={N_NODES} E={g.num_edges} "
          f"M={M} S={S} (total walk-edges {edges_walked})")
    rows = []
    for n in ns:
        if n > total_devices:
            continue
        mesh = make_mesh(n, graph_axis=1)

        def run_repl():
            spgk = sample_gsets_sharded(g, seeds, M, S, mesh, seed=SEED)
            return spgk.sizes

        t_repl = time_fn(run_repl)

        pcsr = partition_csr(g, n, seed=SEED)
        flatmesh = make_mesh(n, graph_axis=n)

        def run_part(routing):
            spgk = sample_gsets_partitioned(pcsr, seeds, M, S, flatmesh,
                                            seed=SEED, routing=routing)
            return spgk.sizes

        t_probe = time_fn(lambda: run_part("probe"))
        t_cap = time_fn(lambda: run_part("capacity"))
        t_part = min(t_probe, t_cap)
        rows.append((n, t_repl, t_part))
        print(f"N={n}: replicated {t_repl*1e3:8.1f} ms "
              f"({edges_walked/t_repl/1e6:7.2f} M edges/s)   "
              f"probe {t_probe*1e3:8.1f} ms (x{t_probe/t_repl:.2f})   "
              f"capacity {t_cap*1e3:8.1f} ms (x{t_cap/t_repl:.2f})",
              flush=True)

    base = rows[0]
    print("\nstrong scaling (fixed total work) vs N=%d:" % base[0])
    for n, t_repl, t_part in rows:
        eff_r = base[1] / t_repl / (n / base[0])
        eff_p = base[2] / t_part / (n / base[0])
        print(f"N={n}: replicated speedup {base[1]/t_repl:5.2f} "
              f"(eff {100*eff_r:5.1f}%)  partitioned speedup "
              f"{base[2]/t_part:5.2f} (eff {100*eff_p:5.1f}%)")


if __name__ == "__main__":
    main()
