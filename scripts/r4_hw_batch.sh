#!/bin/bash
# Round-4 serial chip batch (ONE TPU job at a time; fetch-forced timing
# inside each script). Run AFTER the attribution seeds-1,2 runs finish.
# Usage: bash scripts/r4_hw_batch.sh 2>&1 | tee /tmp/r4_batch.log
set -x
cd "$(dirname "$0")/.."

echo "=== [A] headline gate: coarse-trilinear candidate vs trilinear (3 seeds)"
python scripts/interp_gate.py --logs --candidate "levels:ttttssssssss"
echo "gate exit: $?"

echo "=== [B] MeshRIR step: hybridc:7 and hybridc:3"
timeout 3600 python scripts/bench_meshrir.py "hybridc:7"
timeout 3600 python scripts/bench_meshrir.py "hybridc:3"

echo "=== [C] flagship bench: hybridc:7 and hybridc:3 (fwd+bwd, no extras)"
AVR_TPU_BENCH_EXTRAS=0 AVR_TPU_BENCH_INTERP="hybridc:7" timeout 3600 python bench.py
AVR_TPU_BENCH_EXTRAS=0 AVR_TPU_BENCH_INTERP="hybridc:3" timeout 3600 python bench.py

echo "=== [D] selective-remat sweep (flagship trilinear + MeshRIR trilinear)"
for pol in dots dots_nb; do
  AVR_TPU_BENCH_EXTRAS=0 AVR_TPU_REMAT=$pol timeout 3600 python bench.py
done
for pol in dots dots_nb; do
  AVR_TPU_REMAT=$pol timeout 3600 python scripts/bench_meshrir.py trilinear
done

echo "=== [D2] scatter payload pf32 A/B on the DEFAULT klm backward (ADVICE r3)"
AVR_TPU_SCATTER_PAYLOAD=f32 timeout 3600 python scripts/bench_meshrir.py trilinear

echo "=== [E] HPO compile-aware study: runtime variant, r3-equal budget"
timeout 5400 python scripts/hpo_real_study.py 8 --iters 1500 --variant runtime --interp simplex

echo "=== [F] C50-valid full-budget run (T=1600), trilinear + hybridc:4"
timeout 10800 python scripts/interp_fullbudget_ab.py 40000 --seeds 0 \
  --modes "trilinear,hybridc:4" --seq 1600 --summary c50_T1600_s0.json

echo "=== [G] HPO runtime study at 5k iters/trial"
timeout 7200 python scripts/hpo_real_study.py 8 --iters 5000 --variant runtime --interp simplex

echo "=== [H] async-ckpt probe on the chip"
timeout 1800 python scripts/ckpt_async_probe.py axon

echo "=== r4 batch done"
