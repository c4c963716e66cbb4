#!/bin/bash
# Round-2 hardware measurement batch: packed-gather + trilinear one-hot
# A/Bs on the real chip, prioritized so a slow remote compile can't eat
# the whole budget. One TPU job at a time (CLAUDE.md) — strictly serial.
#
# Completion is signalled by a PER-LAUNCH marker file (/tmp/r2_hw.done),
# removed at start and touched at the end — never by grepping the log,
# which persists across launches and would let a follower start while a
# relaunched batch still owns the chip (round-2 advisor finding).
cd /root/repo
LOG=/tmp/r2_hw.log
DONE=/tmp/r2_hw.done
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

# 0) exactness of the packed carriers on the device (denormal hazard).
# A bitwise mismatch means the packed path is numerically broken — skip
# the pack2/pack4 timing A/Bs rather than spend chip budget on them.
PACK_OK=1
run 900 python scripts/pack2_check.py || PACK_OK=0
[ "$PACK_OK" = 1 ] || echo "==== pack2_check FAILED: skipping pack A/Bs" >> "$LOG"

# 1) trilinear (reference-parity algorithm) on the MeshRIR shape
run 1500 python scripts/meshrir_env_ab.py --interp=trilinear base:
[ "$PACK_OK" = 1 ] && run 1500 python scripts/meshrir_env_ab.py --interp=trilinear \
         pack2:AVR_TPU_GATHER_PACK2=1
run 1800 python scripts/meshrir_env_ab.py --interp=trilinear \
         onehot:AVR_TPU_DENSE_ONEHOT=65536
[ "$PACK_OK" = 1 ] && run 1800 python scripts/meshrir_env_ab.py --interp=trilinear \
         oh_pack2:AVR_TPU_DENSE_ONEHOT=65536,AVR_TPU_GATHER_PACK2=1

# 2) simplex floor vs packed gather
if [ "$PACK_OK" = 1 ]; then
  run 1500 python scripts/meshrir_env_ab.py base: pack2:AVR_TPU_GATHER_PACK2=1
else
  run 1500 python scripts/meshrir_env_ab.py base:
fi

# 3) flagship bench: default, then the complex64-packed F=4 gather
run 1200 python bench.py
[ "$PACK_OK" = 1 ] && run 1200 env AVR_TPU_GATHER_PACK4=1 python bench.py

echo "==== batch done [$(date +%H:%M:%S)]" >> "$LOG"
touch "$DONE"
