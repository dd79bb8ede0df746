#!/bin/bash
# Round-3 phase 4: EMA training run (the round-3 EMA feature must not stay
# an untrained knob — same standard VERDICT r2 applied to the perceptual
# loss).  20k textured steps with optim.ema_decay=0.999 (time constant
# ~1k steps), then the pinned 256^2 eval on BOTH the raw and EMA params.
set -u
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR="${JAX_COMPILATION_CACHE_DIR:-/root/repo/.jax_cache}"
LOG=runs/round3_queue2.log
echo "=== queue2 start $(date -u)" >> "$LOG"

# 0. stem-2 regression chase: round-1 recorded 33.6 fps for stem-2; the
# round-3 re-bench reads 28.9 (fused) / 26.3 (unfused).  A/B the other
# round-2 change that touches the inference graph (the producer-fused
# intermediate clamp) at stem 2.
[ -s runs/bench_r3_clampoff.json ] || { timeout 3600 python bench.py \
  --set model.clamp_intermediate=false \
  > runs/bench_r3_clampoff.json 2> runs/bench_r3_clampoff.log
  echo "--- bench clampoff rc=$? $(date -u)" >> "$LOG"; }

# 0b. environment-vs-code disambiguation: the ROUND-1 code (worktree at
# b93bc8b, where stem-2 recorded 33.6 fps) re-benched on today's chip.
# ~33.6 again => round-2 code changes cost stem-2; ~29 => the environment
# (libtpu/tunnel) changed and today's numbers are the honest baseline.
if [ -d /tmp/r1code ] && [ ! -s runs/bench_r1code_stem2.json ]; then
  (cd /tmp/r1code && timeout 3600 python bench.py --stem 2 --base 128) \
    > runs/bench_r1code_stem2.json 2> runs/bench_r1code_stem2.log
  echo "--- bench r1code stem2 rc=$? $(date -u)" >> "$LOG"
fi

if [ ! -f runs/prf_ema20k/DONE ]; then
  timeout 14400 python train.py --preset config3_prf \
    --set data.loader=grain --set model.remat=true \
    --set model.dtype=bfloat16 --set checkpoint.save_interval_steps=5000 \
    --set checkpoint.keep_last_n=2 --set optim.ema_decay=0.999 \
    --steps 20000 --workdir runs/prf_ema20k >> runs/prf_ema20k.log 2>&1
  rc=$?
  echo "--- train prf_ema20k rc=$rc $(date -u)" >> "$LOG"
  if [ $rc -eq 0 ]; then
    timeout 3600 python tools/quality_eval.py \
      --checkpoint runs/prf_ema20k/checkpoints --preset config3_prf \
      --set model.dtype=bfloat16 > runs/prf_ema20k/quality_256.txt 2>&1
    echo "--- eval raw rc=$? $(date -u)" >> "$LOG"
    timeout 3600 python tools/quality_eval.py \
      --checkpoint runs/prf_ema20k/checkpoints --preset config3_prf \
      --set model.dtype=bfloat16 --ema \
      > runs/prf_ema20k/quality_256_ema.txt 2>&1
    echo "--- eval ema rc=$? $(date -u)" >> "$LOG"
    touch runs/prf_ema20k/DONE
  fi
fi
echo "=== queue2 end $(date -u)" >> "$LOG"
