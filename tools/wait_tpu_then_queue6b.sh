#!/bin/bash
# Wait for the axon TPU tunnel to come back (it went UNAVAILABLE at
# 2026-08-17 20:26), then launch the retry-capable 50k extended run
# (round3_queue6b.sh).  Each probe is bounded; probe results are logged
# so the outage window is on record.
set -u
cd "$(dirname "$0")/.."
LOG=runs/tpu_wait.log
echo "=== wait_tpu start $(date -u)" >> "$LOG"
while true; do
  timeout 600 python -c "import jax; print(jax.devices())" >> "$LOG" 2>&1
  rc=$?
  echo "probe rc=$rc $(date -u)" >> "$LOG"
  [ $rc -eq 0 ] && break
  sleep 120
done
echo "=== tunnel back $(date -u) — launching queue6b" >> "$LOG"
bash tools/round3_queue6b.sh
