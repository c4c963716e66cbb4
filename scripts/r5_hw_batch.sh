#!/bin/bash
# Round-5 serial chip batch #1 (ONE TPU job at a time; fetch-forced
# timing inside each script).
# Usage: bash scripts/r5_hw_batch.sh 2>&1 | tee /tmp/r5_batch.log
set -x
cd "$(dirname "$0")/.."

echo "=== [A] flagship: group-gather single-scatter A/B (hybridc:7 default)"
timeout 5400 python scripts/ab_env.py \
  "pergroup:AVR_TPU_GROUP_GATHER=0" \
  "multi:AVR_TPU_GROUP_GATHER=1"

echo "=== [B] MeshRIR hybridc:7: group-gather A/B"
AVR_TPU_GROUP_GATHER=0 timeout 3600 python scripts/bench_meshrir.py "hybridc:7"
AVR_TPU_GROUP_GATHER=1 timeout 3600 python scripts/bench_meshrir.py "hybridc:7"

echo "=== [C] MeshRIR trilinear parity: group-gather A/B"
AVR_TPU_GROUP_GATHER=0 timeout 3600 python scripts/bench_meshrir.py trilinear
AVR_TPU_GROUP_GATHER=1 timeout 3600 python scripts/bench_meshrir.py trilinear

echo "=== [D] MeshRIR trilinear: dense one-hot threshold re-probe under split"
# auto = 65536 for F<=2; probe off and 4x-up (compile guarded by timeout)
AVR_TPU_DENSE_ONEHOT=0      timeout 2700 python scripts/bench_meshrir.py trilinear
AVR_TPU_DENSE_ONEHOT=262144 timeout 2700 python scripts/bench_meshrir.py trilinear

echo "=== [E] sort-cost scaling probe (sub-run batched sorts)"
timeout 3600 python scripts/sort_probe.py
