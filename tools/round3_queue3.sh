#!/bin/bash
# Round-3 phase 5 (after the EMA run): s2d-via-conv A/B at both stems, and
# re-traces with the enhanced attribute_trace (named non-conv ops) — the
# committed evidence for the VERDICT r2 item-3 analysis.
set -u
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR="${JAX_COMPILATION_CACHE_DIR:-/root/repo/.jax_cache}"
LOG=runs/round3_queue3.log
echo "=== queue3 start $(date -u)" >> "$LOG"
step() { echo "--- $1 rc=$2 $(date -u)" >> "$LOG"; }

[ -s runs/bench_r3_s2dconv.json ] || { timeout 3600 python bench.py \
  --set model.s2d_via_conv=true \
  > runs/bench_r3_s2dconv.json 2> runs/bench_r3_s2dconv.log; step s2d_stem2 $?; }
[ -s runs/bench_r3_s2dconv_stem4.json ] || { timeout 3600 python bench.py \
  --stem 4 --base 256 --set model.s2d_via_conv=true \
  > runs/bench_r3_s2dconv_stem4.json 2> runs/bench_r3_s2dconv_stem4.log
  step s2d_stem4 $?; }

# scoped int8 PTQ: quantize only the wide convs (Cin>=256: ~2/3 of conv
# FLOPs at stem-2; Cin>=512: bottleneck third) — chasing the int8 +22%
# inside the 0.05 dB budget by keeping the high-res convs bf16
for MC in 256 512; do
  [ -s runs/bench_r3_int8_mc$MC.json ] || { timeout 3600 python bench.py \
    --set model.conv_int8=true --set model.conv_int8_min_cin=$MC \
    > runs/bench_r3_int8_mc$MC.json 2> runs/bench_r3_int8_mc$MC.log
    step int8_mc$MC $?; }
  [ -s runs/prf_textured/quality_int8_mc$MC.txt ] || { timeout 3600 python \
    tools/quality_eval.py --checkpoint runs/prf_textured/checkpoints \
    --preset config3_prf --set model.dtype=bfloat16 \
    --set model.conv_int8=true --set model.conv_int8_min_cin=$MC \
    > runs/prf_textured/quality_int8_mc$MC.txt 2>&1; step q_int8_mc$MC $?; }
done

# named non-conv traces (enhanced tool: shapes, layouts, fused opcodes)
[ -s runs/trace_r3_stem2_named.txt ] || { timeout 3600 python \
  tools/attribute_trace.py --stem 2 --base 128 --top 40 \
  --json runs/trace_r3_stem2_full.json \
  > runs/trace_r3_stem2_named.txt 2>&1; step trace2_named $?; }
[ -s runs/trace_r3_s2dconv.txt ] || { timeout 3600 python \
  tools/attribute_trace.py --stem 2 --base 128 --top 40 --s2d-via-conv \
  > runs/trace_r3_s2dconv.txt 2>&1; step trace_s2d $?; }

echo "=== queue3 end $(date -u)" >> "$LOG"
