#!/bin/bash
# Round-3 sequential chip queue: perceptual A/B + lr-2e-4 stability runs,
# each followed by the pinned 256^2 quality eval (VERDICT r2 items 2 & 6).
# Runs unattended; one job at a time on the single chip.
set -u
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR="${JAX_COMPILATION_CACHE_DIR:-/root/repo/.jax_cache}"
LOG=runs/round3_queue.log
echo "=== queue start $(date -u)" >> "$LOG"

# save_interval 5000: checkpoints are GB-scale device->host fetches through
# the tunnel; every-1000-steps saving wedged the stem-4 run (see DESIGN.md
# round-3 notes) and costs minutes even when it works.
COMMON_TRAIN="--set data.loader=grain --set model.remat=true \
  --set model.dtype=bfloat16 --set checkpoint.save_interval_steps=5000 \
  --set checkpoint.keep_last_n=2"

run_one() {  # name steps extra_overrides...
  local name="$1"; shift
  local steps="$1"; shift
  if [ -f "runs/$name/DONE" ]; then echo "skip $name (done)" >> "$LOG"; return; fi
  echo "--- train $name start $(date -u)" >> "$LOG"
  timeout 14400 python train.py --preset config3_prf $COMMON_TRAIN "$@" \
    --steps "$steps" --workdir "runs/$name" >> "runs/$name.log" 2>&1
  local rc=$?
  echo "--- train $name rc=$rc $(date -u)" >> "$LOG"
  if [ $rc -eq 0 ]; then
    timeout 3600 python tools/quality_eval.py \
      --checkpoint "runs/$name/checkpoints" --preset config3_prf \
      --set model.dtype=bfloat16 > "runs/$name/quality_256.txt" 2>&1
    echo "--- eval $name rc=$? $(date -u)" >> "$LOG"
    touch "runs/$name/DONE"
  fi
}

# E: clean pixel-only control at lr 1e-4 (the perceptual A/B baseline —
# the r2 run's early steps were trained at 2e-4 before its divergence)
run_one prf_pixel_ctrl 20000

# C: gradient-surrogate perceptual (weight chosen so the term is ~60% of
# the pixel term at blurry-input error levels; see BASELINE.md round 3)
run_one prf_grad20k 20000 \
  --set loss.perceptual_weight=0.5 --set loss.perceptual_mode=gradient

# D: VGG perceptual, fixed-seed random filters (no VGG weights on this
# zero-egress host — the documented offline fallback)
run_one prf_vgg20k 20000 \
  --set loss.perceptual_weight=0.2 --set loss.perceptual_mode=vgg

# B: lr 2e-4 with linear warmup — settle the divergence question
run_one prf_lr2e4_warmup 20000 \
  --set optim.learning_rate=2e-4 --set optim.lr_warmup_steps=2000

echo "=== queue end $(date -u)" >> "$LOG"
