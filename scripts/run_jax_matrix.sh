#!/bin/bash
# Sequential JAX-side (TPU) accuracy rows for the r5 head-to-head matrix.
# ONE TPU process at a time (CLAUDE.md); flags mirror the torch-oracle
# rows in run_oracle_matrix.sh exactly.
set -u
cd "$(dirname "$0")/.."
mkdir -p results/jax_r5

run() {
  name=$1; shift
  echo "=== $name: $(date -u +%H:%M:%S) ==="
  timeout 7200 python -m surel_plus_tpu.cli.main "$@" \
    --log_dir results/jax_r5/logs \
    > results/jax_r5/$name.out 2> results/jax_r5/$name.log
  echo "=== $name done rc=$? $(date -u +%H:%M:%S) ==="
}

runh() {
  name=$1; shift
  echo "=== $name: $(date -u +%H:%M:%S) ==="
  timeout 7200 python -m surel_plus_tpu.cli.main_horder "$@" \
    --log_dir results/jax_r5/logs \
    > results/jax_r5/$name.out 2> results/jax_r5/$name.log
  echo "=== $name done rc=$? $(date -u +%H:%M:%S) ==="
}

run collabs_mean --dataset fixture-collabs --aggrs mean --num_walks 50 \
  --num_steps 3 --k 10 --epochs 20 --eval_steps 2 --early_stop 10 \
  --runs 3 --batch_size 4096
run collabs_attn --dataset fixture-collabs --aggrs attn --num_walks 50 \
  --num_steps 3 --k 10 --epochs 20 --eval_steps 2 --early_stop 10 \
  --runs 6 --batch_size 4096
run collabs_lstm --dataset fixture-collabs --aggrs lstm --num_walks 20 \
  --num_steps 3 --k 5 --epochs 12 --eval_steps 2 --early_stop 10 \
  --runs 3 --batch_size 1024
run collab_mean --dataset fixture-collab --aggrs mean --num_walks 200 \
  --num_steps 3 --k 10 --epochs 30 --eval_steps 2 --early_stop 10 \
  --runs 3 --batch_size 4096
run collab_attn --dataset fixture-collab --aggrs attn --num_walks 200 \
  --num_steps 3 --k 10 --epochs 30 --eval_steps 2 --early_stop 10 \
  --runs 3 --batch_size 4096
run cites_mean --dataset fixture-cites --aggrs mean --num_walks 50 \
  --num_steps 3 --k 10 --epochs 16 --eval_steps 2 --early_stop 10 \
  --runs 3 --batch_size 4096
echo "ALL DONE $(date -u +%H:%M:%S)"
