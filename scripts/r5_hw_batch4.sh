#!/bin/bash
# Round-5 serial chip batch #4: HPO QUALITY study (VERDICT r4 item 7) —
# runtime-variant (one compiled program, runtime-scalar hparams) at a
# per-trial budget big enough for the DoA objective to become
# informative (the fullbudget curves cross <15 deg around 8k iters).
# Usage: bash scripts/r5_hw_batch4.sh [n_trials] 2>&1 | tee /tmp/r5_batch4.log
set -x
cd "$(dirname "$0")/.."
N=${1:-20}
timeout 10800 python scripts/hpo_real_study.py "$N" --iters 8000 \
  --variant runtime --interp "hybridc:4"
