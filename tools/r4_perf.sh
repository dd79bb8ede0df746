#!/bin/bash
# Round-4 on-chip perf arms (VERDICT r3 items 5 & 7):
#   1. s2d_pallas A/B — the Pallas input-pack kernel vs the default bench,
#      same session (cross-session fps drift is ±40%, BASELINE.md);
#   2. HTTP serving daemon end-to-end latency vs the direct session, same
#      process (tools/bench_serving_http.py);
#   3. a control bench (also the post-chain sanity run).
set -u
cd "$(dirname "$0")/.."
source tools/queue_lib.sh
queue_init runs/r4_perf.log "${QUEUE_DEADLINE:-}"

run_step bench_control 3600 runs/bench_r4_control.json \
  python bench.py
run_step bench_s2d_pallas 3600 runs/bench_r4_s2dpallas.json \
  python bench.py --set model.s2d_pallas=true

run_step serving_http 3600 runs/serving_http_r4.json \
  python tools/bench_serving_http.py --streams 2 --keys 16 \
    ${SERVING_WEIGHTS:+--weights "$SERVING_WEIGHTS"}

echo "=== r4_perf done $(date -u)" >> "$QUEUE_LOG"
