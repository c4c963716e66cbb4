#!/bin/bash
# Round-3 chip batch, part D (final). Waits for the running retune
# process, then runs the remaining items in strict priority order for
# the time left before round end:
#   1) re-run the FIXED spmd_overhead (the r3 fix: state pre-replicated,
#      2-step warmup — the earlier "+899%" was a hidden second compile)
#   2) trilinear-flagship one-hot crossover A/B (real perf candidate)
#   3) K=8 scatter tile retune (ts2048)
#   4) flagship headroom sweep (as far as time allows)
# Usage: bash scripts/r3_hw_batch_d.sh <wait_pid>
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
echo "==== part D starting [$(date +%H:%M:%S)]" >> "$LOG"

run 2400 python scripts/spmd_overhead.py

run 2400 python scripts/ab_env.py \
         oh64k:AVR_TPU_DENSE_ONEHOT=65536 \
         oh3e5:AVR_TPU_DENSE_ONEHOT=300000

run 2400 python scripts/meshrir_env_ab.py --interp=trilinear \
         ts2048:AVR_TPU_SCATTER_TS=2048 \
         ts2048uc:AVR_TPU_SCATTER_TS=2048,AVR_TPU_SCATTER_UC=2048

run 3600 python scripts/ab_env.py base: \
         edges:AVR_TPU_SCATTER_EDGES=exact \
         tof:AVR_TPU_SCATTER_TOF=search \
         smxla:AVR_TPU_SMALL_SCATTER=xla \
         sortmin:AVR_TPU_SORTED_MIN_ROWS=131072 \
         gradcons:AVR_TPU_GRAD_LAYOUT=consumer \
         barrier:AVR_TPU_GATHER_BARRIER=1 \
         idxb:AVR_TPU_IDX_BARRIER=1

echo "==== batch done [$(date +%H:%M:%S)]" >> "$LOG"
touch /tmp/r3_hw.done
