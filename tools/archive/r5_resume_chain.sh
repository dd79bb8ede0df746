#!/bin/bash
# Round-5 resume chain (session restart after VM reset): the three queued
# chip jobs that never completed, run sequentially.
#   1. r5_final_unpack  — A/B the d2s_final_via_conv default (be74a49):
#                         arm pins the OLD reshape-form final unpack, so
#                         control(new default) vs arm(old) is the claim.
#   2. static scales    — re-calibrate (the .scales.npz was lost to the VM
#                         reset) then gate model.conv_int8_static through
#                         the standard driver with --promote.
#   3. serving v2       — HTTP-vs-direct re-record under the REAL serving
#                         mode (the first record measured the card's fp32
#                         training config — see tools/r5_serving2.sh).
set -u
cd "$(dirname "$0")/.."
source tools/queue_lib.sh

queue_init runs/r5_resume.log "${QUEUE_DEADLINE:-}"
wait_for_tpu 3600 30 || exit 1

bash tools/run_experiment.sh r5_final_unpack --no-eval \
  model.d2s_final_via_conv=false
_qlog "r5_final_unpack done"

REL=weights/prf_ema_r4.npz
SCALES="${REL%.npz}.scales.npz"
if [ ! -s "$SCALES" ]; then
  run_step calibrate 2400 runs/r5_static_calibrate2.txt \
    python tools/calibrate_int8.py --checkpoint "$REL" --out "$SCALES" \
      --clips 8 --keys 12 --size 256
fi
if [ -s "$SCALES" ]; then
  bash tools/run_experiment.sh r5_int8static --promote --weights "$REL" \
    "model.conv_int8_static=$SCALES"
  _qlog "r5_int8static done"
else
  _qlog "calibration produced no scales — skipping r5_int8static"
fi

run_step serving_http_v2 3600 runs/serving_http_r5b.json \
  python tools/bench_serving_http.py --streams 2 --keys 16 \
    --weights weights/prf_ema_r4.npz

echo "=== r5_resume_chain done $(date -u)" >> "$QUEUE_LOG"
