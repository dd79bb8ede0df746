#!/bin/bash
# Round-3 phase 7: serving-path A/B under the new int8 default, the EMA
# checkpoint at the declared 352x640 protocol, and a released-weights demo.
set -u
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR="${JAX_COMPILATION_CACHE_DIR:-/root/repo/.jax_cache}"
LOG=runs/round3_queue5.log
echo "=== queue5 start $(date -u)" >> "$LOG"
step() { echo "--- $1 rc=$2 $(date -u)" >> "$LOG"; }

[ -s runs/serving_async_int8.json ] || { timeout 3600 python bench.py \
  --streaming --async-drain --batch 2 \
  > runs/serving_async_int8.json 2> runs/serving_async_int8.log
  step serving_int8 $?; }

[ -s runs/prf_ema20k/quality_352x640_ema.txt ] || { timeout 3600 python \
  tools/quality_eval.py --checkpoint runs/prf_ema20k/checkpoints \
  --preset config3_prf --set model.dtype=bfloat16 --ema --size 352 640 \
  > runs/prf_ema20k/quality_352x640_ema.txt 2>&1; step ema_352 $?; }

[ -d /tmp/demo_ema_out ] || { timeout 1800 bin-tpu-demo \
  --weights weights/prf_ema_r3.npz --input /tmp/demo_folder/demo \
  --out /tmp/demo_ema_out > runs/demo_ema.log 2>&1; step demo_ema $?; }

echo "=== queue5 end $(date -u)" >> "$LOG"
