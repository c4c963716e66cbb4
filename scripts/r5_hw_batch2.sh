#!/bin/bash
# Round-5 serial chip batch #2: sub-run sorted-scatter A/B.
# Usage: bash scripts/r5_hw_batch2.sh 2>&1 | tee /tmp/r5_batch2.log
set -x
cd "$(dirname "$0")/.."

echo "=== [A] flagship: sub-run sort sweep (hybridc:7 default)"
timeout 7200 python scripts/ab_env.py \
  "subruns0:AVR_TPU_SORT_SUBRUNS=0" \
  "auto:AVR_TPU_SORT_SUBRUNS=auto" \
  "s2:AVR_TPU_SORT_SUBRUNS=2" \
  "s4:AVR_TPU_SORT_SUBRUNS=4" \
  "s8:AVR_TPU_SORT_SUBRUNS=8"

echo "=== [B] MeshRIR hybridc:7: sub-run sort A/B"
AVR_TPU_SORT_SUBRUNS=0    timeout 3600 python scripts/bench_meshrir.py "hybridc:7"
AVR_TPU_SORT_SUBRUNS=auto timeout 3600 python scripts/bench_meshrir.py "hybridc:7"
AVR_TPU_SORT_SUBRUNS=16   timeout 3600 python scripts/bench_meshrir.py "hybridc:7"

echo "=== [C] MeshRIR trilinear parity: sub-run sort A/B"
AVR_TPU_SORT_SUBRUNS=0    timeout 3600 python scripts/bench_meshrir.py trilinear
AVR_TPU_SORT_SUBRUNS=auto timeout 3600 python scripts/bench_meshrir.py trilinear
AVR_TPU_SORT_SUBRUNS=16   timeout 3600 python scripts/bench_meshrir.py trilinear
