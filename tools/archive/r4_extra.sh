#!/bin/bash
# Round-4 extras: runs AFTER tools/r4_finalize.sh completes (waits for its
# "r4_finalize done" line, or its process to be gone).
#
#   1. self-ensemble (x4 spatial-flip TTA) pinned 256^2 eval of the record
#      checkpoint — measures the TTA eval mode's quality gain on-chip so
#      BASELINE.md can state it as a number, not a literature estimate;
#   2. the same at the declared 352x640 protocol (if time allows).
#
# Idempotent (queue_lib stamps); never git-commits.
set -u
cd "$(dirname "$0")/.."
source tools/queue_lib.sh
queue_init runs/r4_extra.log "${QUEUE_DEADLINE:-}"

while true; do
  grep -q "r4_finalize done" runs/r4_finalize.log 2>/dev/null && break
  if [ -f /tmp/r4_finalize.pid ] && ! kill -0 "$(cat /tmp/r4_finalize.pid)" 2>/dev/null; then
    _qlog "finalize process gone without completion line — proceeding"
    break
  fi
  sleep 60
done
_qlog "finalize settled"

WD=runs/prf_r4
EV="python tools/quality_eval.py --checkpoint $WD/checkpoints --preset config3_prf --set model.dtype=bfloat16"

run_step eval_tta_256_ema 3600 $WD/quality_256_ema_tta.txt \
  $EV --ema --self-ensemble --json-out $WD/eval_256_ema_tta.json
run_step eval_tta_352x640_ema 5400 $WD/quality_352x640_ema_tta.txt \
  $EV --ema --self-ensemble --size 352 640 \
  --json-out $WD/eval_352x640_ema_tta.json

echo "=== r4_extra done $(date -u)" >> "$QUEUE_LOG"
