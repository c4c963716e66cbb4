#!/bin/bash
# Round-5 serial chip batch #4: HPO QUALITY study (VERDICT r4 item 7)
# via the vectorized population path (hpo/population.py) — K trials per
# vmapped step make a quality-budget (8k-iter) study fit the remaining
# chip window.
#
# Phase 1: throughput probe (K=1/4/8; if the default Pallas sorted
# scatter fails or stalls under vmap, re-probe with the XLA scatter).
# Phase 2: the study at the winning K.
# Usage: bash scripts/r5_hw_batch4.sh [n_trials] [iters] 2>&1 | tee /tmp/r5_batch4.log
set -x
cd "$(dirname "$0")/.."
N=${1:-32}
IT=${2:-5000}

echo "=== [A] population throughput probe (default scatter path)"
# K=8 only: the serial baseline is already measured (r4 runtime study,
# 19.6 trials/h = 184 s/trial) and each probe K is a fresh remote
# compile (1-15 min) — don't spend two compiles on inferable points
timeout 2700 python scripts/pop_probe.py 8 || {
  echo "=== [A2] default path failed — probing AVR_TPU_SCATTER=xla fallback"
  AVR_TPU_SCATTER=xla timeout 2700 python scripts/pop_probe.py 8
}

echo "=== [B] population quality study: $N trials x ${IT} iters, pop 8 (earlier serial 5k-iter study hit 10.0 deg best in 8 trials)"
timeout 10800 python scripts/hpo_real_study.py "$N" --iters "$IT" \
  --variant runtime --interp "hybridc:4" --pop 8
