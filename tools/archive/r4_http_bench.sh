#!/bin/bash
# Round-4 follow-up: re-measure the 720p HTTP-vs-direct serving pair AFTER
# the TCP_NODELAY fix (commit a9790bc).  The 07:50 UTC attempt overlapped a
# tunnel outage (direct control itself wedged), so its numbers are void;
# the bench is same-process paired, so a healthy run is self-calibrating.
set -u
cd "$(dirname "$0")/.."
source tools/queue_lib.sh
queue_init runs/r4_http_bench.log "${QUEUE_DEADLINE:-$(date -d '2026-08-19 10:10 UTC' +%s)}"
wait_for_tpu 7200 60 || exit 1
run_step serving_http_fixed 3600 runs/serving_http_r4_fixed.json \
  python tools/bench_serving_http.py --streams 2 --keys 16 \
    --weights weights/prf_ema_r4.npz
