#!/bin/bash
# Round-4 flagship quality chain (VERDICT r3 items 1 & 4).
#
# Quality-of-record recipe (picked per VERDICT r3 item 1): config3_prf
# pixel-only loss + EMA(0.999) — the measured PSNR winner of the round-3
# loss A/B (BASELINE.md).  One continuous 50k-step run (the preset's lr
# decay schedule completes at 50k) with pinned-protocol eval points at
# 20k / 35k / 50k so the saturation curve is on record.
#
# Every step is idempotent (queue_lib.sh stamps) — safe to re-launch after
# a crash, VM reset, or tunnel outage.
set -u
cd "$(dirname "$0")/.."
source tools/queue_lib.sh
queue_init runs/r4_flagship.log "${QUEUE_DEADLINE:-}"

WD=runs/prf_r4
TRAIN="python train.py --preset config3_prf
  --set data.loader=grain --set model.remat=true --set model.dtype=bfloat16
  --set checkpoint.save_interval_steps=5000 --set checkpoint.keep_last_n=2
  --set optim.ema_decay=0.999 --workdir $WD"
EV="python tools/quality_eval.py --checkpoint $WD/checkpoints --preset config3_prf --set model.dtype=bfloat16"

ckpt_step() { ls "$WD/checkpoints" 2>/dev/null | grep -E '^[0-9]+$' | sort -n | tail -1; }

# --- stage 1: 20k steps (the round-3 record recipe, reproduced) ---------
run_step_retry 3 train20k 14400 $WD/STAGE1/DONE $TRAIN --steps 20000 || exit 1

run_step eval20k_256_ema 2400 $WD/quality_256_ema_20k.txt \
  $EV --ema --json-out $WD/eval_256_ema_20k.json
run_step eval20k_256_raw 2400 $WD/quality_256_raw_20k.txt \
  $EV --json-out $WD/eval_256_raw_20k.json
run_step eval20k_352x640_ema 3600 $WD/quality_352x640_ema_20k.txt \
  $EV --ema --size 352 640 --json-out $WD/eval_352x640_ema_20k.json

# insurance export: an in-repo-committable release exists the moment the
# 20k evals do (round 3 lost its record checkpoint to a VM reset)
run_step export20k 1200 $WD/EXPORT20K/DONE \
  python -c "from bin_tpu.cli import export_main; export_main(
    ['--preset','config3_prf','--checkpoint','$WD/checkpoints',
     '--out','weights/prf_ema_r4.npz','--ema','--store-dtype','float16',
     '--eval-json','$WD/eval_256_ema_20k.json',
     '--eval-json','$WD/eval_352x640_ema_20k.json',
     '--note','config3 pixel-only + EMA(0.999), 20k steps, textured synthetic (r4 stage 1)'])"

# --- stage 2: continue the SAME run to 35k (lr decay still active) -------
run_step_retry 3 train35k 14400 $WD/STAGE2/DONE $TRAIN --steps 35000 || exit 1
run_step eval35k_256_ema 2400 $WD/quality_256_ema_35k.txt \
  $EV --ema --json-out $WD/eval_256_ema_35k.json

# --- stage 3: complete the 50k schedule ----------------------------------
run_step_retry 3 train50k 14400 $WD/STAGE3/DONE $TRAIN --steps 50000 || exit 1
run_step eval50k_256_ema 2400 $WD/quality_256_ema_50k.txt \
  $EV --ema --json-out $WD/eval_256_ema_50k.json
run_step eval50k_256_raw 2400 $WD/quality_256_raw_50k.txt \
  $EV --json-out $WD/eval_256_raw_50k.json
run_step eval50k_352x640_ema 3600 $WD/quality_352x640_ema_50k.txt \
  $EV --ema --size 352 640 --json-out $WD/eval_352x640_ema_50k.json

echo "=== r4_flagship chain complete $(date -u)" >> "$QUEUE_LOG"
