#!/bin/bash
# Phase-3 torch-oracle row: the LSTM cell-loop row, re-queued after the
# r5 oracle padding optimization (index_put instead of split+pad_sequence).
set -u
cd "$(dirname "$0")/.."
mkdir -p results/oracle_r5

while ! grep -q "PHASE2 DONE" results/oracle_r5_phase2.log 2>/dev/null; do
  sleep 60
done

echo "=== collabs_lstm: $(date -u +%H:%M:%S) ==="
timeout 21600 python scripts/torch_reference_fixture.py \
  --dataset fixture-collabs --aggrs lstm --num_walks 20 --num_steps 3 \
  --k 5 --epochs 12 --eval_steps 2 --early_stop 10 --runs 3 \
  --batch_size 1024 \
  > results/oracle_r5/collabs_lstm.out 2> results/oracle_r5/collabs_lstm.log
echo "=== collabs_lstm done rc=$? $(date -u +%H:%M:%S) ==="
echo "PHASE3 DONE $(date -u +%H:%M:%S)"
