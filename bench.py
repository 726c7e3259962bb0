"""Benchmark: end-to-end training throughput (SpJoin + model fwd/bwd/update)
on a citation2-class workload, real TPU chip.

Prints ONE JSON line:
  {"metric": "train_queries_per_s", "value": N, "unit": "queries/s",
   "vs_baseline": R}

Baseline: the reference trains 10K queries in 0.35 s on one A100-40GB
(paper Table 4, citation2 row; see BASELINE.md) => 28,571 queries/s.
The workload matches that row's hyperparameters: S=4 (3 walk steps), M=100
walks, mean aggregation, hidden 96 — on an RMAT graph standing in for the
OGB download (hermetic environment).
"""

import json
import sys
import time

import numpy as np

BASELINE_QPS = 10_000 / 0.35  # paper Table 4: 0.35 s / 10K queries (A100)


def main():
    import jax
    import jax.numpy as jnp

    from surel_plus_tpu.graph.synthetic import rmat_graph
    from surel_plus_tpu.models import Net
    from surel_plus_tpu.ops.join import gather_join
    from surel_plus_tpu.ops.sampler import sample_gsets
    from surel_plus_tpu.train import LinkPredictor, TrainConfig

    num_nodes, num_edges = 250_000, 2_500_000
    num_walks, num_steps = 100, 3          # CLI S=4 => 3 walk steps
    batch_size = 8192

    print(f"device: {jax.devices()[0].device_kind}", file=sys.stderr)
    t0 = time.time()
    g = rmat_graph(num_nodes, num_edges, seed=0)
    print(f"graph: N={g.num_nodes} E={g.num_edges} "
          f"({time.time()-t0:.1f}s)", file=sys.stderr)

    t0 = time.time()
    seeds = np.arange(num_nodes, dtype=np.int32)
    spg = sample_gsets(g, seeds, num_walks=num_walks, num_steps=num_steps,
                       seed=0)
    dt_sample = time.time() - t0
    sets_per_s = num_nodes / dt_sample
    print(f"sampling: {dt_sample:.1f}s ({sets_per_s:,.0f} sets/s, "
          f"enc_unique={spg.num_unique_enc})", file=sys.stderr)

    cfg = TrainConfig(batch_size=batch_size, lr=1e-3)
    model = Net(input_dim=num_steps + 1, hidden_dim=96, aggrs="mean",
                dropout=0.1)
    pred = LinkPredictor(model, spg, cfg)

    rng = np.random.default_rng(0)
    E = 200_000
    edges = rng.integers(0, num_nodes, size=(2, E)).astype(np.int32)
    labels = (rng.random(E) < 0.5).astype(np.float32)

    params, opt_state = pred.init(jax.random.PRNGKey(0),
                                  edges[:, :batch_size])
    key = jax.random.PRNGKey(1)

    # warmup (compile)
    def run_steps(n_steps, params, opt_state):
        nonlocal key
        for i in range(n_steps):
            lo = (i * batch_size) % (E - batch_size)
            be = jnp.asarray(edges[:, lo:lo + batch_size])
            bl = jnp.asarray(labels[lo:lo + batch_size])
            w = jnp.ones((batch_size,), jnp.float32)
            key, sub = jax.random.split(key)
            params, opt_state, loss, logits = pred._step(
                params, opt_state, be, bl, w, sub)
        jax.block_until_ready(loss)
        return params, opt_state

    params, opt_state = run_steps(3, params, opt_state)
    n_timed = 40
    t0 = time.time()
    params, opt_state = run_steps(n_timed, params, opt_state)
    dt = time.time() - t0
    qps = n_timed * batch_size / dt
    print(f"train: {n_timed} steps x {batch_size} in {dt:.2f}s",
          file=sys.stderr)

    print(json.dumps({
        "metric": "train_queries_per_s",
        "value": round(qps, 1),
        "unit": "queries/s",
        "vs_baseline": round(qps / BASELINE_QPS, 3),
    }))


if __name__ == "__main__":
    main()
