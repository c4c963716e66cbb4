#!/bin/bash
# Stage 2: wait for the hardware A/B batch to finish, then run the
# full-budget trilinear-vs-simplex quality A/B (VERDICT r1 item #2) on
# the chip. Resume-safe: each finished run leaves a result.json.
cd /root/repo
while ! grep -q "batch done" /tmp/r2_hw.log 2>/dev/null; do sleep 60; done
echo "==== [$(date +%H:%M:%S)] stage2: interp_fullbudget_ab 40000 x seeds 0,1,2" \
  >> /tmp/r2_stage2.log
timeout 14400 python scripts/interp_fullbudget_ab.py 40000 --seeds 0,1,2 \
  >> /tmp/r2_stage2.log 2>&1
echo "---- exit=$? [$(date +%H:%M:%S)]" >> /tmp/r2_stage2.log
