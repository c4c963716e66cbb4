#!/bin/bash
# Round-5 serial chip batch #3: reference-budget convergence run, then
# the C50-valid (T=1600) 3-seed interp gate (VERDICT r4 items 4 + 5).
# Usage: bash scripts/r5_hw_batch3.sh 2>&1 | tee /tmp/r5_batch3.log
set -x
cd "$(dirname "$0")/.."

echo "=== [A] RAF reference-budget convergence run (80k iters, batch 4, T=1600)"
timeout 14400 python scripts/convergence_raf.py 80000

echo "=== [B] C50-valid T=1600 gate: seeds 0,1,2 x {trilinear, hybridc:4}"
timeout 14400 python scripts/interp_fullbudget_ab.py 40000 --seeds 0,1,2 \
  --modes "trilinear,hybridc:4" --seq 1600 --summary c50_T1600_gate.json
python scripts/interp_gate.py --logs --candidate "hybridc:4" --seq 1600
echo "gate exit: $?"
