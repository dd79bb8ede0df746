#!/bin/bash
# Round-5 serving re-record, second attempt: the first record
# (runs/serving_http_r5_fp32card.json) measured the CARD's training config
# (fp32, no int8) because the bench built the model straight from the
# card, and its steady-state window contained two ~35 s emission-program
# compiles at keys 4-5.  bench_serving_http.py now applies the real
# serving mode (bench.py's scoped-int8 defaults + BENCH_OVERRIDES + --set)
# and pre-compiles all stream programs before the timed arms.  Runs after
# the static-scales chain (the last queued chip work) so it never contends.
set -u
cd "$(dirname "$0")/.."
source tools/queue_lib.sh

while [ -f /tmp/r5_static.pid ] && kill -0 "$(cat /tmp/r5_static.pid)" 2>/dev/null; do
  sleep 60
done

queue_init runs/r5_chain.log "${QUEUE_DEADLINE:-}"
wait_for_tpu 3600 30 || exit 1
run_step serving_http_v2 3600 runs/serving_http_r5b.json \
  python tools/bench_serving_http.py --streams 2 --keys 16 \
    --weights weights/prf_ema_r4.npz
echo "=== r5_serving2 done $(date -u)" >> "$QUEUE_LOG"
