#!/bin/bash
# Stage 2: wait for the hardware A/B batch to finish, then run the
# full-budget trilinear-vs-simplex quality A/B (VERDICT r1 item #2) on
# the chip. Resume-safe: each finished run leaves a result.json.
#
# Gates on the batch's PER-LAUNCH marker file (touched at batch end,
# removed at batch start) — not on grepping its reused log, where a
# stale "batch done" from a previous launch would put two concurrent
# jobs on the single TPU (round-2 advisor finding).
cd /root/repo
while [ ! -f /tmp/r2_hw.done ]; do sleep 60; done
echo "==== [$(date +%H:%M:%S)] stage2: interp_fullbudget_ab 40000 x seeds 0,1,2" \
  >> /tmp/r2_stage2.log
# 23400s sized from the measured ~36 ms/step trilinear rate (6 runs x
# 40k iters + compiles + per-checkpoint DoA ~ 3h) with 2x headroom; the
# re-invoke after a timeout skips cached result.json runs and emits the
# cross-seed summary that a mid-run kill would otherwise lose.
timeout 23400 python scripts/interp_fullbudget_ab.py 40000 --seeds 0,1,2 \
  >> /tmp/r2_stage2.log 2>&1
rc=$?
echo "---- exit=$rc [$(date +%H:%M:%S)]" >> /tmp/r2_stage2.log
if [ "$rc" != 0 ]; then
  timeout 23400 python scripts/interp_fullbudget_ab.py 40000 --seeds 0,1,2 \
    >> /tmp/r2_stage2.log 2>&1
  echo "---- retry exit=$? [$(date +%H:%M:%S)]" >> /tmp/r2_stage2.log
fi
