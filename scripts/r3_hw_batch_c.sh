#!/bin/bash
# Round-3 chip batch, part C (gated on part B's /tmp/r3_hw.done):
# trace the MeshRIR trilinear DEFAULT program and attribute its 2,131
# ms to ops — the per-level cost table that closes VERDICT item 3's
# alternate done-condition (floor proof) now that every graph-side idea
# (layout knobs r1, packed words r2, one-hot threshold + producer/
# consumer barriers + K=8 retunes r3) has measured flat or negative.
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

while [ ! -f /tmp/r3_hw.done ]; do sleep 30; done
echo "==== part C starting [$(date +%H:%M:%S)]" >> "$LOG"

run 2700 python scripts/trace_meshrir.py --interp=trilinear /tmp/meshrir_trace_tri_r3
run 600  python scripts/parse_trace.py /tmp/meshrir_trace_tri_r3

echo "==== part C done [$(date +%H:%M:%S)]" >> "$LOG"
touch /tmp/r3_hw_c.done
