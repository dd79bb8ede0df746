#!/bin/bash
# Round-5 re-basing chain (VERDICT r4 tasks 1, 2, 4): every perf artifact
# and standing A/B verdict predates the d2s-via-conv layout flip (commit
# 7490f51), so re-measure them all on the graph that actually ships.
# Thin orchestrator only — the experiment logic lives in the reusable
# tools/run_experiment.sh driver (task 6).
set -u
cd "$(dirname "$0")/.."
source tools/queue_lib.sh
queue_init runs/r5_chain.log "${QUEUE_DEADLINE:-}"
wait_for_tpu 3600 30 || exit 1

# --- 1. post-d2s audit: trace + HLO of the SHIPPING default ---------------
# (d2s_via_conv + int8 min_cin=256 + int8 LSTM gates = what bench.py runs)
# NB: --dump-hlo is a chipless mode that EXITS without tracing, so the HLO
# dump and the measured trace are two separate steps.
run_step hlo_dump_default 1800 runs/hlo_dump_r5.log \
  python tools/attribute_trace.py --stem 2 --base 128 \
    --int8 --int8-min-cin 256 --int8-lstm --d2s-conv \
    --dump-hlo runs/hlo_r5_default.txt
run_step trace_default 3600 runs/trace_r5_default.txt \
  python tools/attribute_trace.py --stem 2 --base 128 --top 60 \
    --int8 --int8-min-cin 256 --int8-lstm --d2s-conv \
    --json runs/trace_r5_default.json

# hlo_cost second calibration point (VERDICT r4 weak #5): static estimate
# of the same module the trace just measured
run_step hlo_cost_default 600 runs/hlo_cost_r5_default.txt \
  python tools/hlo_cost.py runs/hlo_r5_default.txt

# --- 2. stale A/Bs, re-decided on the new graph ----------------------------
# s2d_via_conv: bit-exact impl flag; its r3 -3.4% predated the layout flip
# and its rationale (mixed-layout joins) is gone. Promote if it now wins.
bash tools/run_experiment.sh r5_s2dconv --no-eval --promote \
  model.s2d_via_conv=true

# int8 scope Cin>=128: +9.4% fps in r4 but 0.031 dB over budget at PTQ.
# Re-measure both sides on the new graph (now incl. int8 LSTM gates).
bash tools/run_experiment.sh r5_int8c128 --promote \
  model.conv_int8_min_cin=128

# stem-4/base-256 speed-variant record row (not a default candidate: it is
# a different architecture whose quality trained 0.87 dB worse, r3)
run_step bench_stem4 2400 runs/r5_stem4/bench_arm.json \
  python bench.py --stem 4 --base 256

# --- 3. serving re-record on the shipped graph (VERDICT r4 task 4) --------
run_step serving_http 3600 runs/serving_http_r5.json \
  python tools/bench_serving_http.py --streams 2 --keys 16 \
    --weights weights/prf_ema_r4.npz

# --- 4. flag-debt re-measures on the new graph (VERDICT r4 task 7) --------
# confirm (or overturn) the stale-graph negatives before demoting the flags:
# pallas LSTM was -38% pre-d2s; MSE-clip PTQ calibration was ~no-gain
bash tools/run_experiment.sh r5_pallas_lstm --no-eval \
  model.use_pallas_lstm=true
bash tools/run_experiment.sh r5_mseclip \
  model.conv_int8_mse_clip=true

echo "=== r5_chain done $(date -u)" >> "$QUEUE_LOG"
