#!/bin/bash
# Sequential torch-oracle runs for the r5 accuracy head-to-head matrix
# (VERDICT r4 items 1+8): hardened 100k-negative fixtures, all aggregators.
set -u
cd "$(dirname "$0")/.."
mkdir -p results/oracle_r5

run() {
  name=$1; shift
  echo "=== $name: $(date -u +%H:%M:%S) ==="
  timeout 21600 python scripts/torch_reference_fixture.py "$@" \
    > results/oracle_r5/$name.out 2> results/oracle_r5/$name.log
  echo "=== $name done rc=$? $(date -u +%H:%M:%S) ==="
}

run collabs_mean --dataset fixture-collabs --aggrs mean --num_walks 50 \
  --num_steps 3 --k 10 --epochs 20 --eval_steps 2 --early_stop 10 \
  --runs 3 --batch_size 4096
run collabs_attn --dataset fixture-collabs --aggrs attn --num_walks 50 \
  --num_steps 3 --k 10 --epochs 20 --eval_steps 2 --early_stop 10 \
  --runs 3 --batch_size 4096
run collabs_lstm --dataset fixture-collabs --aggrs lstm --num_walks 20 \
  --num_steps 3 --k 5 --epochs 12 --eval_steps 2 --early_stop 10 \
  --runs 3 --batch_size 1024
run collab_mean --dataset fixture-collab --aggrs mean --num_walks 200 \
  --num_steps 3 --k 10 --epochs 30 --eval_steps 2 --early_stop 10 \
  --runs 3 --batch_size 4096
run collab_attn --dataset fixture-collab --aggrs attn --num_walks 200 \
  --num_steps 3 --k 10 --epochs 30 --eval_steps 2 --early_stop 10 \
  --runs 3 --batch_size 4096
echo "ALL DONE $(date -u +%H:%M:%S)"
