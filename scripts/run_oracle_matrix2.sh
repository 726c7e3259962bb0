#!/bin/bash
# Phase-2 torch-oracle rows (MRR + HONet); waits for phase 1 to finish
# so at most one torch oracle runs at a time on this 4-core box.
set -u
cd "$(dirname "$0")/.."
mkdir -p results/oracle_r5

while ! grep -q "ALL DONE" results/oracle_r5_driver.log 2>/dev/null; do
  sleep 60
done

run() {
  name=$1; script=$2; shift 2
  echo "=== $name: $(date -u +%H:%M:%S) ==="
  timeout 21600 python "$script" "$@" \
    > results/oracle_r5/$name.out 2> results/oracle_r5/$name.log
  echo "=== $name done rc=$? $(date -u +%H:%M:%S) ==="
}

run cites_mean scripts/torch_reference_fixture.py \
  --dataset fixture-cites --aggrs mean --num_walks 50 --num_steps 3 \
  --k 10 --epochs 16 --eval_steps 2 --early_stop 10 --runs 3 \
  --batch_size 4096
run tags_honet scripts/torch_reference_horder.py \
  --dataset npz:surel_plus_tpu/data/fixtures/tags_fixture.npz \
  --num_walks 100 --num_steps 3 --k 10 --epochs 10 --eval_steps 2 \
  --early_stop 10 --runs 3 --batch_size 4096
echo "PHASE2 DONE $(date -u +%H:%M:%S)"
