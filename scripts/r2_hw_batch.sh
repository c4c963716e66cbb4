#!/bin/bash
# Round-2 hardware measurement batch: packed-gather + trilinear one-hot
# A/Bs on the real chip, prioritized so a slow remote compile can't eat
# the whole budget. One TPU job at a time (CLAUDE.md) — strictly serial.
cd /root/repo
LOG=/tmp/r2_hw.log
: > "$LOG"
run() {
  local t="$1"; shift
  echo "==== [$(date +%H:%M:%S)] $* (timeout ${t}s)" >> "$LOG"
  timeout "$t" "$@" >> "$LOG" 2>&1
  echo "---- exit=$? [$(date +%H:%M:%S)]" >> "$LOG"
}

# 0) exactness of the packed carriers on the device (denormal hazard)
run 900  python scripts/pack2_check.py

# 1) trilinear (reference-parity algorithm) on the MeshRIR shape
run 1500 python scripts/meshrir_env_ab.py --interp=trilinear base:
run 1500 python scripts/meshrir_env_ab.py --interp=trilinear \
         pack2:AVR_TPU_GATHER_PACK2=1
run 1800 python scripts/meshrir_env_ab.py --interp=trilinear \
         onehot:AVR_TPU_DENSE_ONEHOT=65536
run 1800 python scripts/meshrir_env_ab.py --interp=trilinear \
         oh_pack2:AVR_TPU_DENSE_ONEHOT=65536,AVR_TPU_GATHER_PACK2=1

# 2) simplex floor vs packed gather
run 1500 python scripts/meshrir_env_ab.py \
         base: pack2:AVR_TPU_GATHER_PACK2=1

# 3) flagship bench: default, then the complex64-packed F=4 gather
run 1200 python bench.py
run 1200 env AVR_TPU_GATHER_PACK4=1 python bench.py

echo "==== batch done [$(date +%H:%M:%S)]" >> "$LOG"
