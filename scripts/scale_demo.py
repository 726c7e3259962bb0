"""Scale demonstration toward the reference's billion-edge claim
(VERDICT r4 item 4; reference README.md:28-32 runs twitter-follower
1.5B edges on one 500G-RAM machine, CPU-sampling + GPU training).

Mode `device` (default, REAL TPU, run solo):
  1. host-generate a >=100M-edge RMAT in chunks (measured RSS + time),
  2. ingest via the native O(E) builder (native/graphkit.cpp),
  3. device-resident block-pipelined sampling of SEEDS node sets,
  4. one multi-epoch DeviceTrainer.fit over QUERIES random queries,
  5. HBM + host-RAM accounting (jax.live_arrays + /proc RSS).

Mode `partitioned` (CPU, 8 virtual devices): the same graph class at a
CPU-tractable size through partition_csr + sample_gsets_partitioned,
reporting per-device graph bytes replicated vs edge-partitioned — the
capacity story for graphs too big to replicate per chip.

env: N, DRAWS, SEEDS, QUERIES, WALKS, STEPS, BUCKET
  python scripts/scale_demo.py device       # solo TPU session
  python scripts/scale_demo.py partitioned  # CPU mesh
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np  # noqa: E402

MODE = sys.argv[1] if len(sys.argv) > 1 else "device"

if MODE == "partitioned":
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

if MODE == "partitioned" or os.environ.get("SUREL_PLATFORM") == "cpu":
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax_bench_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402

t00 = time.time()


def log(m):
    print(f"[{time.time()-t00:7.1f}s] {m}", flush=True)


def rss_gb():
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS"):
                return int(line.split()[1]) / 1e6
    return float("nan")


def device_gb():
    return sum(a.nbytes for a in jax.live_arrays()) / 1e9


def rmat_pairs_chunked(n, draws, seed, chunk=20_000_000):
    """Directed R-MAT pairs [E, 2] int32 generated in chunks (bounded
    peak RAM); self-loops dropped, duplicates left for the native
    builder's coalesce."""
    rng = np.random.default_rng(seed)
    scale = max(1, int(np.ceil(np.log2(max(n, 2)))))
    out = []
    pa, pb, pc = 0.57, 0.76, 0.95
    done = 0
    while done < draws:
        m = min(chunk, draws - done)
        src = np.zeros(m, dtype=np.int64)
        dst = np.zeros(m, dtype=np.int64)
        for _ in range(scale):
            r = rng.random(m)
            src <<= 1
            dst <<= 1
            dst |= ((r >= pa) & (r < pb)) | (r >= pc)
            src |= (r >= pb)
        src %= n
        dst %= n
        keep = src != dst
        out.append(np.stack([src[keep], dst[keep]],
                            axis=1).astype(np.int32))
        done += m
    return np.concatenate(out)


def main_device():
    from surel_plus_tpu.graph.csr import csr_from_edges
    from surel_plus_tpu.models import Net
    from surel_plus_tpu.ops.sampler import sample_gsets_device_keys
    from surel_plus_tpu.train import TrainConfig
    from surel_plus_tpu.train.device import trainer_from_keys

    N = int(os.environ.get("N", 10_000_000))
    DRAWS = int(os.environ.get("DRAWS", 120_000_000))
    SEEDS = int(os.environ.get("SEEDS", 2_000_000))
    QUERIES = int(os.environ.get("QUERIES", 16 * 4096))
    WALKS = int(os.environ.get("WALKS", 50))
    STEPS = int(os.environ.get("STEPS", 3))
    BUCKET = int(os.environ.get("BUCKET", 128))
    bs = 4096

    log(f"device={jax.devices()[0].device_kind} N={N:,} DRAWS={DRAWS:,}")
    t0 = time.time()
    edges = rmat_pairs_chunked(N, DRAWS, seed=0)
    log(f"RMAT gen: {len(edges):,} directed pairs in "
        f"{time.time()-t0:.1f}s (RSS {rss_gb():.1f} GB)")

    t0 = time.time()
    g = csr_from_edges(edges, num_nodes=N, symmetrize=True)
    del edges
    log(f"native ingest: N={g.num_nodes:,} nnz={g.num_edges:,} "
        f"(~{g.num_edges//2:,} undirected) in {time.time()-t0:.1f}s "
        f"(RSS {rss_gb():.1f} GB)")

    seeds = np.arange(SEEDS, dtype=np.int32)
    t0 = time.time()
    spgk = sample_gsets_device_keys(g, seeds, num_walks=WALKS,
                                    num_steps=STEPS, seed=0,
                                    bucket=BUCKET, block_size=65536)
    _ = int(spgk.sizes.max())
    dt = time.time() - t0
    log(f"sampling cold (incl graph upload + compile): {SEEDS:,} sets "
        f"in {dt:.1f}s -> {SEEDS/dt:,.0f} sets/s "
        f"(HBM live {device_gb():.2f} GB)")

    t0 = time.time()
    spgk = sample_gsets_device_keys(g, seeds, num_walks=WALKS,
                                    num_steps=STEPS, seed=1,
                                    shuffle_seed=0, bucket=BUCKET,
                                    block_size=65536)
    _ = int(spgk.sizes.max())
    dt = time.time() - t0
    log(f"sampling warm: {SEEDS/dt:,.0f} sets/s "
        f"({SEEDS*WALKS*STEPS/dt/1e6:.1f}M walked edges/s)")

    spg_gb = sum(int(np.prod(a.shape)) * 4 for a in
                 (spgk.nodes, spgk.khi, spgk.klo)) / 1e9
    log(f"SpG keys footprint: {spg_gb:.2f} GB "
        f"(L={int(spgk.nodes.shape[1])}); HBM live {device_gb():.2f} GB "
        f"(RSS {rss_gb():.1f} GB)")

    cfg = TrainConfig(batch_size=bs, lr=1e-3)
    model = Net(input_dim=STEPS + 1, hidden_dim=96, aggrs="mean",
                dropout=0.1, dtype="bfloat16")
    trainer = trainer_from_keys(model, spgk, cfg)
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.integers(0, SEEDS,
                                 size=(2, QUERIES)).astype(np.int32))
    labels = jnp.asarray((rng.random(QUERIES) < 0.5).astype(np.float32))
    params, opt_state = trainer.init(jax.random.PRNGKey(0),
                                     np.asarray(q[:, :bs]))
    key = jax.random.PRNGKey(1)
    n_epochs = 4
    t0 = time.time()
    key, sub = jax.random.split(key)
    params, opt_state, losses, _ = trainer.fit(params, opt_state, q,
                                               labels, sub, n_epochs)
    log(f"fit cold: loss={float(losses[-1]):.4f} {time.time()-t0:.1f}s")
    t0 = time.time()
    key, sub = jax.random.split(key)
    params, opt_state, losses, _ = trainer.fit(params, opt_state, q,
                                               labels, sub, n_epochs)
    _ = float(losses[-1])
    dt = time.time() - t0
    log(f"train warm: {n_epochs}x{QUERIES:,} queries in {dt:.2f}s -> "
        f"{n_epochs*QUERIES/dt:,.0f} q/s "
        f"(HBM live {device_gb():.2f} GB, RSS {rss_gb():.1f} GB)")


def main_partitioned():
    from surel_plus_tpu.graph.csr import csr_from_edges
    from surel_plus_tpu.parallel.dist import make_mesh
    from surel_plus_tpu.parallel.partition import (
        partition_csr, sample_gsets_partitioned)

    N = int(os.environ.get("N", 2_000_000))
    DRAWS = int(os.environ.get("DRAWS", 20_000_000))
    SEEDS = int(os.environ.get("SEEDS", 65_536))
    WALKS = int(os.environ.get("WALKS", 25))
    STEPS = int(os.environ.get("STEPS", 3))

    log(f"partitioned mode: {jax.device_count()} devices N={N:,}")
    edges = rmat_pairs_chunked(N, DRAWS, seed=0)
    g = csr_from_edges(edges, num_nodes=N, symmetrize=True)
    del edges
    log(f"graph: nnz={g.num_edges:,} (RSS {rss_gb():.1f} GB)")
    ndev = jax.device_count()
    mesh = make_mesh(ndev)
    t0 = time.time()
    pcsr = partition_csr(g, ndev, seed=0)
    log(f"partition_csr: {time.time()-t0:.1f}s")
    # replicated sampling keeps indices + shuffled (+ etab/stab [E,3]
    # each) on EVERY device; partitioned keeps only its shard's Emax
    emax = int(pcsr.indices.shape[1])
    words_per_edge = 2 + (6 if pcsr.etab is not None else 0)
    full_bytes = g.num_edges * 4 * words_per_edge
    part_bytes = emax * 4 * words_per_edge
    log(f"per-device graph bytes: replicated {full_bytes/1e9:.3f} GB "
        f"every device; partitioned max {part_bytes/1e9:.3f} GB "
        f"(x{full_bytes/max(part_bytes,1):.1f} capacity headroom)")
    seeds = np.arange(SEEDS, dtype=np.int32)
    t0 = time.time()
    spgk = sample_gsets_partitioned(pcsr, seeds, WALKS, STEPS, mesh,
                                    seed=0)
    _ = int(np.asarray(spgk.sizes).max())
    dt = time.time() - t0
    log(f"partitioned sampling: {SEEDS:,} sets in {dt:.1f}s "
        f"({SEEDS/dt:,.0f} sets/s on the CPU mesh)")


if __name__ == "__main__":
    if MODE == "partitioned":
        main_partitioned()
    else:
        main_device()
