#!/bin/bash
# Round-3 phase 8: the extended-preset run — config3_prf_extended (gradient
# perceptual w=0.5 + EMA 0.999, both measured winners) trained 50k steps
# (2.5x the previous runs) on the textured benchmark, then the full eval
# battery. Closes "the extended preset has never itself been trained" and
# measures how quality scales with steps.
set -u
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR="${JAX_COMPILATION_CACHE_DIR:-/root/repo/.jax_cache}"
LOG=runs/round3_queue6.log
echo "=== queue6 start $(date -u)" >> "$LOG"
step() { echo "--- $1 rc=$2 $(date -u)" >> "$LOG"; }

if [ ! -f runs/prf_ext50k/DONE ]; then
  timeout 14400 python train.py --preset config3_prf_extended \
    --set data.loader=grain --set model.remat=true \
    --set model.dtype=bfloat16 --set checkpoint.save_interval_steps=5000 \
    --set checkpoint.keep_last_n=2 \
    --steps 50000 --workdir runs/prf_ext50k >> runs/prf_ext50k.log 2>&1
  rc=$?
  step train_ext50k $rc
  [ $rc -eq 0 ] && touch runs/prf_ext50k/DONE
fi

if [ -f runs/prf_ext50k/DONE ]; then
  q() { local out="$1"; shift
    [ -s "$out" ] && return
    timeout 3600 python tools/quality_eval.py \
      --checkpoint runs/prf_ext50k/checkpoints \
      --preset config3_prf_extended --set model.dtype=bfloat16 "$@" \
      > "$out" 2>&1; step "$(basename $out)" $?; }
  q runs/prf_ext50k/quality_256.txt
  q runs/prf_ext50k/quality_256_ema.txt --ema
  q runs/prf_ext50k/quality_352x640_ema.txt --ema --size 352 640
  q runs/prf_ext50k/quality_256_ema_int8mc256.txt --ema \
    --set model.conv_int8=true --set model.conv_int8_min_cin=256
fi
echo "=== queue6 end $(date -u)" >> "$LOG"
