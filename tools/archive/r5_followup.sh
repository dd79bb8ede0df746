#!/bin/bash
# Round-5 follow-up: wait for the main r5 chain to finish, re-run it once
# (idempotent — picks up the steps added after launch: the measured trace
# and the flag-debt re-measures), then run the 10k low-lr scoped QAT
# fine-tune (the one untried path to the +9% Cin>=128 serving scope,
# BASELINE.md round-4 scope verdict).
set -u
cd "$(dirname "$0")/.."

while [ -f /tmp/r5_chain.pid ] && kill -0 "$(cat /tmp/r5_chain.pid)" 2>/dev/null; do
  sleep 60
done

bash tools/r5_chain.sh

FPS_VERDICT=runs/r5_int8c128/VERDICT.json \
  bash tools/qat_finetune.sh r5_qat10k 10000 1e-5 128

echo "=== r5_followup done $(date -u)" >> runs/r5_chain.log
