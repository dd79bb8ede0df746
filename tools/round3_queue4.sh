#!/bin/bash
# Round-3 phase 6: the deployment-combo eval — EMA quality-of-record params
# evaluated under the scoped-int8 serving mode (the bench-of-record config).
set -u
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR="${JAX_COMPILATION_CACHE_DIR:-/root/repo/.jax_cache}"
LOG=runs/round3_queue4.log
echo "=== queue4 start $(date -u)" >> "$LOG"
step() { echo "--- $1 rc=$2 $(date -u)" >> "$LOG"; }

[ -s runs/prf_ema20k/quality_256_ema_int8mc256.txt ] || { timeout 3600 \
  python tools/quality_eval.py --checkpoint runs/prf_ema20k/checkpoints \
  --preset config3_prf --set model.dtype=bfloat16 --ema \
  --set model.conv_int8=true --set model.conv_int8_min_cin=256 \
  > runs/prf_ema20k/quality_256_ema_int8mc256.txt 2>&1
  step ema_int8mc256 $?; }

# final flagship bench with the new default (scoped int8) for the record
timeout 3600 python bench.py > runs/bench_r3_final.json \
  2> runs/bench_r3_final.log
step bench_final $?
echo "=== queue4 end $(date -u)" >> "$LOG"
