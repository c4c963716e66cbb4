#!/bin/bash
# Round-3 post-quality-A/B serial chip batch. Gates on stage 1's
# PER-LAUNCH marker (/tmp/r3_stage1.done — touched when the full-budget
# interp A/B exits), then runs strictly serially: one TPU job at a time.
# Ordered so the VERDICT deliverables land even if later items run out
# of round budget: hardware verify of the new K=8 one-hot default →
# trilinear threshold sweep + retunes (item 3) → SPMD overhead bound
# (item 7) → bench → real HPO study (item 4) → flagship headroom
# sweep (item 8).
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

while [ ! -f /tmp/r3_stage1.done ]; do sleep 30; done
echo "==== stage1 done, starting chip batch [$(date +%H:%M:%S)]" >> "$LOG"

# 1) hardware verify: render/grad parity incl. the K=8 one-hot default
run 2700 python scripts/verify_drive.py axon

# 2) trilinear MeshRIR: new default, then the one-hot break-even point.
#    MeshRIR's grids have only 2-3 DENSE levels (sizes 4913, 35937,
#    then hashed 262144 / dir 274625@log2=20) — the level loop breaks at
#    the first hashed level, so the only threshold above auto's 65536
#    that changes the program is 300000 (captures the dir encoding's
#    274625-row level 2); anything higher is a no-op.
run 1800 python scripts/meshrir_env_ab.py --interp=trilinear base:
run 2400 python scripts/meshrir_env_ab.py --interp=trilinear \
         oh3e5:AVR_TPU_DENSE_ONEHOT=300000

# 3) K=8 retunes at the auto threshold (klm minor dim, scatter payload
#    packing, scatter tile/chunk sizes — all were tuned at K=4; the K=8
#    sorted stream is 2x the rows)
run 2700 python scripts/meshrir_env_ab.py --interp=trilinear \
         klm16:AVR_TPU_KLM_MINOR=16 klm64:AVR_TPU_KLM_MINOR=64 \
         pf32:AVR_TPU_SCATTER_PAYLOAD=f32
run 2700 python scripts/meshrir_env_ab.py --interp=trilinear \
         ts2048:AVR_TPU_SCATTER_TS=2048 \
         ts2048uc:AVR_TPU_SCATTER_TS=2048,AVR_TPU_SCATTER_UC=2048

# 4) SPMD machinery overhead bound on the real chip (1-device mesh)
run 2700 python scripts/spmd_overhead.py

# 5) flagship bench with the final defaults
run 1200 python bench.py

# 6) real HPO study: 8 trials end-to-end (train -> val npz -> NormMUSIC
#    objective -> report figure)
run 9000 python scripts/hpo_real_study.py 8

# 7) flagship headroom sweep (accept flat results; record them)
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
