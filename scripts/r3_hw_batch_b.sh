#!/bin/bash
# Round-3 chip batch, part B (replaces r3_hw_batch.sh items 5-8 —
# part A's shell was stopped at the oh3e5 boundary; this waits for that
# exact PID, then continues strictly serially, one TPU job at a time).
# New first item: the AVR_TPU_IDX_BARRIER A/B — the round-3 candidate
# explanation for the K=8 11.6 vs K=4 5.7 ns/row gather gap.
# Usage: bash scripts/r3_hw_batch_b.sh <wait_pid>
cd /root/repo
LOG=/tmp/r3_hw.log
DONE=/tmp/r3_hw.done
rm -f "$DONE"
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
echo "==== part B starting [$(date +%H:%M:%S)]" >> "$LOG"

# 4b) index-producer barrier on the K=8 gather fusion
run 2700 python scripts/meshrir_env_ab.py --interp=trilinear \
         idxb:AVR_TPU_IDX_BARRIER=1

# 5) real HPO study: 8 trials end-to-end (train -> val npz -> NormMUSIC
#    objective -> report figure). Resume-safe.
run 10800 python scripts/hpo_real_study.py 8

# 6) K=8 retunes at the auto threshold
run 2700 python scripts/meshrir_env_ab.py --interp=trilinear \
         klm16:AVR_TPU_KLM_MINOR=16 klm64:AVR_TPU_KLM_MINOR=64 \
         pf32:AVR_TPU_SCATTER_PAYLOAD=f32
run 2700 python scripts/meshrir_env_ab.py --interp=trilinear \
         ts2048:AVR_TPU_SCATTER_TS=2048 \
         ts2048uc:AVR_TPU_SCATTER_TS=2048,AVR_TPU_SCATTER_UC=2048

# 7) SPMD machinery overhead bound on the real chip (1-device mesh)
run 2700 python scripts/spmd_overhead.py

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
touch "$DONE"
