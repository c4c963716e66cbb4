#!/bin/bash
# Round-3 chip batch, part B3 — replaces part B's items 6-8 with a
# budget-aware order (HPO trials measured ~30 min each; the round ends
# before all of part B + C would fit). Waits on the running HPO python
# PID, regenerates the study summary if the study was cut at a trial
# boundary, then runs the SHORT high-value items first:
#   spmd overhead bound (item 7) -> default-program trace (item 3 floor
#   table) -> K=8 retunes (item 6) -> flagship headroom (item 8).
# Usage: bash scripts/r3_hw_batch_b3.sh <hpo_pid>
cd /root/repo
LOG=/tmp/r3_hw.log
run() {
  local t="$1"; shift
  echo "==== [$(date +%H:%M:%S)] $* (timeout ${t}s)" >> "$LOG"
  timeout "$t" "$@" >> "$LOG" 2>&1
  local rc=$?
  echo "---- exit=$rc [$(date +%H:%M:%S)]" >> "$LOG"
  return $rc
}

WAIT_PID="${1:-}"
if [ -n "$WAIT_PID" ]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 15; done
fi
echo "==== part B3 starting [$(date +%H:%M:%S)]" >> "$LOG"

# If the study was cut mid-flight, re-running with the recorded trial
# count skips training and just dumps study_trials.jsonl + the report
# figure (runs no device code).
run 600 python scripts/hpo_real_study.py 0

# 7) SPMD machinery overhead bound on the real chip (1-device mesh)
run 2700 python scripts/spmd_overhead.py

# 3-floor) trace the MeshRIR trilinear DEFAULT program -> per-op table
run 2700 python scripts/trace_meshrir.py --interp=trilinear /tmp/meshrir_trace_tri_r3
run 600  python scripts/parse_trace.py /tmp/meshrir_trace_tri_r3

# 6) K=8 retunes at the auto threshold
run 2700 python scripts/meshrir_env_ab.py --interp=trilinear \
         klm16:AVR_TPU_KLM_MINOR=16 klm64:AVR_TPU_KLM_MINOR=64 \
         pf32:AVR_TPU_SCATTER_PAYLOAD=f32
run 2700 python scripts/meshrir_env_ab.py --interp=trilinear \
         ts2048:AVR_TPU_SCATTER_TS=2048 \
         ts2048uc:AVR_TPU_SCATTER_TS=2048,AVR_TPU_SCATTER_UC=2048


# 8b) trilinear-flagship one-hot re-test: the F=4 one-hot LOSS (82->90
#     ms) was measured on the SIMPLEX flagship; at K=8 the per-level
#     gather share doubles, so the crossover may flip.
run 2700 python scripts/ab_env.py \
         oh64k:AVR_TPU_DENSE_ONEHOT=65536 \
         oh3e5:AVR_TPU_DENSE_ONEHOT=300000

# 8) flagship headroom sweep (accept flat results; record them)
run 3600 python scripts/ab_env.py base: \
         edges:AVR_TPU_SCATTER_EDGES=exact \
         tof:AVR_TPU_SCATTER_TOF=search \
         smxla:AVR_TPU_SMALL_SCATTER=xla \
         sortmin:AVR_TPU_SORTED_MIN_ROWS=131072 \
         gradcons:AVR_TPU_GRAD_LAYOUT=consumer \
         barrier:AVR_TPU_GATHER_BARRIER=1 \
         idxb:AVR_TPU_IDX_BARRIER=1
run 3600 python scripts/ab_env.py --bs=8 base: \
         c4:AVR_TPU_AB_SHELL_CHUNK=4 \
         c16:AVR_TPU_AB_SHELL_CHUNK=16 \
         nr:AVR_TPU_AB_REMAT=0 \
         c4nr:AVR_TPU_AB_SHELL_CHUNK=4,AVR_TPU_AB_REMAT=0

echo "==== batch done [$(date +%H:%M:%S)]" >> "$LOG"
touch /tmp/r3_hw.done
