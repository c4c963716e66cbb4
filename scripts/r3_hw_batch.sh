#!/bin/bash
# Round-3 serial chip batch (one TPU job at a time). Reordered for a
# COLD compile cache (~/.cache/avr_tpu_jax_cache was wiped between
# sessions; every program recompiles at 1-15 min): the must-land
# deliverables run first so later items can be cut by round end.
#   1) hardware verify of the new trilinear + K=8 one-hot defaults
#   2) flagship bench with the flipped headline mode (trilinear)
#   3) trilinear MeshRIR base (confirm the 2,133 ms default on-chip)
#   4) one-hot break-even threshold (the single informative point)
#   5) real HPO study end-to-end (VERDICT item 4; resume-safe)
#   6) K=8 scatter retunes (VERDICT item 3 continuation)
#   7) SPMD overhead bound (item 7)
#   8) flagship headroom sweep (item 8)
cd /root/repo
LOG=/tmp/r3_hw.log
DONE=/tmp/r3_hw.done
rm -f "$DONE"
: > "$LOG"
run() {
  local t="$1"; shift
  echo "==== [$(date +%H:%M:%S)] $* (timeout ${t}s)" >> "$LOG"
  timeout "$t" "$@" >> "$LOG" 2>&1
  local rc=$?
  echo "---- exit=$rc [$(date +%H:%M:%S)]" >> "$LOG"
  return $rc
}

# 1) hardware verify: render/grad parity incl. the K=8 one-hot default
run 2700 python scripts/verify_drive.py axon

# 2) flagship bench with the final (trilinear) defaults
run 2400 python bench.py

# 3) trilinear MeshRIR: the new default program
run 2400 python scripts/meshrir_env_ab.py --interp=trilinear base:

# 4) one-hot break-even. MeshRIR's grids have only 2-3 DENSE levels
#    (4913 / 35937 rows, then hashed 262144 / dir 274625@log2=20) — the
#    only threshold above auto's 65536 that changes the program is
#    300000 (captures the dir encoding's 274625-row level 2).
run 2400 python scripts/meshrir_env_ab.py --interp=trilinear \
         oh3e5:AVR_TPU_DENSE_ONEHOT=300000

# 5) real HPO study: 8 trials end-to-end (train -> val npz -> NormMUSIC
#    objective -> report figure). Resume-safe; a round-end cut still
#    leaves recorded trials.
run 10800 python scripts/hpo_real_study.py 8

# 6) K=8 retunes at the auto threshold (klm minor dim, scatter payload
#    packing, scatter tile sizes — all were tuned at K=4)
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
         barrier:AVR_TPU_GATHER_BARRIER=1
run 3600 python scripts/ab_env.py --bs=8 base: \
         c4:AVR_TPU_AB_SHELL_CHUNK=4 \
         c16:AVR_TPU_AB_SHELL_CHUNK=16 \
         nr:AVR_TPU_AB_REMAT=0 \
         c4nr:AVR_TPU_AB_SHELL_CHUNK=4,AVR_TPU_AB_REMAT=0

echo "==== batch done [$(date +%H:%M:%S)]" >> "$LOG"
touch "$DONE"
