#!/bin/bash
# Round-5 static-int8-scales experiment: calibrate on the release that
# ships (the QAT release if the r5_qat10k chain promoted one, else the
# record release), then gate model.conv_int8_static through the standard
# driver (eval -> bench arm -> same-session control -> verdict/promote).
set -u
cd "$(dirname "$0")/.."
source tools/queue_lib.sh

while [ -f /tmp/r5_followup.pid ] && kill -0 "$(cat /tmp/r5_followup.pid)" 2>/dev/null; do
  sleep 60
done

REL=weights/prf_ema_r4.npz
[ -s weights/prf_qat128_ema.npz ] && REL=weights/prf_qat128_ema.npz
SCALES="${REL%.npz}.scales.npz"

queue_init runs/r5_static.log "${QUEUE_DEADLINE:-}"
wait_for_tpu 3600 30 || exit 1

run_step calibrate 2400 runs/r5_static_calibrate.txt \
  python tools/calibrate_int8.py --checkpoint "$REL" --out "$SCALES" \
    --clips 8 --keys 12 --size 256

[ -s "$SCALES" ] || { echo "calibration produced no scales" >> "$QUEUE_LOG"; exit 1; }

bash tools/run_experiment.sh r5_int8static --promote --weights "$REL" \
  "model.conv_int8_static=$SCALES"

echo "=== r5_static_chain done $(date -u)" >> "$QUEUE_LOG"
