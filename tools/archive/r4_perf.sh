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

#   4. per-op traces of the record architecture (stem-2/base-128) in both
#      the int8 serving graph (what the fps record runs) and pure bf16 —
#      the committed artifact behind BASELINE.md's attribution table (the
#      round-3 trace was lost to the VM reset; the "~18 ms long tail" dig
#      needs this data on record).
run_step trace_stem2_int8 3600 runs/trace_r4_stem2_int8.txt \
  python tools/attribute_trace.py --stem 2 --base 128 --top 60 \
    --int8 --int8-min-cin 256 --json runs/trace_r4_stem2_int8.json
run_step trace_stem2_bf16 3600 runs/trace_r4_stem2_bf16.txt \
  python tools/attribute_trace.py --stem 2 --base 128 --top 60 \
    --json runs/trace_r4_stem2_bf16.json
run_step trace_stem2_int8all 3600 runs/trace_r4_stem2_int8all.txt \
  python tools/attribute_trace.py --stem 2 --base 128 --top 60 \
    --int8 --json runs/trace_r4_stem2_int8all.json

echo "=== r4_perf done $(date -u)" >> "$QUEUE_LOG"
