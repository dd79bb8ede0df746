#!/bin/bash
# Round-3 perf session (phase 3, after the training queue): per-op trace
# attribution, fused-upsample compile/runtime A/B, int8 PTQ measurements
# (VERDICT r2 items 3 & 9 + weak #3).
set -u
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR="${JAX_COMPILATION_CACHE_DIR:-/root/repo/.jax_cache}"
LOG=runs/round3_perf.log
echo "=== perf start $(date -u)" >> "$LOG"

step() { echo "--- $1 rc=$2 $(date -u)" >> "$LOG"; }

# 1. bench A/Bs on the flagship-of-record (stem 2 / base 128, the
#    quality-holding architecture — round-3 re-baseline): baseline,
#    unfused upsample (compile-time + fps), int8 PTQ convs.
#    bench.py logs compile+first-run to stderr.  These land FIRST — the
#    flagship bench is the round's headline artifact; traces can be slow.
[ -s runs/bench_r3_base.json ] || { timeout 3600 python bench.py \
  > runs/bench_r3_base.json 2> runs/bench_r3_base.log; step bench_base $?; }
[ -s runs/bench_r3_unfused.json ] || { timeout 3600 python bench.py \
  --set model.fused_upsample=false \
  > runs/bench_r3_unfused.json 2> runs/bench_r3_unfused.log; step bench_unfused $?; }
[ -s runs/bench_r3_int8.json ] || { timeout 3600 python bench.py \
  --set model.conv_int8=true \
  > runs/bench_r3_int8.json 2> runs/bench_r3_int8.log; step bench_int8 $?; }

# 2. per-op attribution at both architectures (the non-conv 28% breakdown)
[ -s runs/trace_r3_stem2.txt ] || { timeout 3600 python tools/attribute_trace.py \
  --stem 2 --base 128 --top 40 > runs/trace_r3_stem2.txt 2>&1; step trace_stem2 $?; }
[ -s runs/trace_r3_stem4.txt ] || { timeout 3600 python tools/attribute_trace.py \
  --stem 4 --base 256 --top 40 > runs/trace_r3_stem4.txt 2>&1; step trace_stem4 $?; }

# 3. int8 conv primitive at the two dominant conv shapes
[ -s runs/int8_conv_256.json ] || { timeout 2400 python tools/bench_int8_conv.py \
  --height 180 --width 320 --cin 256 --cout 256 \
  > runs/int8_conv_256.json 2> runs/int8_conv_256.log; step int8_256 $?; }
[ -s runs/int8_conv_1024.json ] || { timeout 2400 python tools/bench_int8_conv.py \
  --height 45 --width 80 --cin 1024 --cout 1024 \
  > runs/int8_conv_1024.json 2> runs/int8_conv_1024.log; step int8_1024 $?; }

# 3b. PTQ quality delta: the r2 stem-2 checkpoint evaluated with int8
#     convs under the pinned 256^2 protocol (pairs with bench_r3_int8)
[ -s runs/prf_textured/quality_int8.txt ] || { timeout 3600 python \
  tools/quality_eval.py --checkpoint runs/prf_textured/checkpoints \
  --preset config3_prf --set model.dtype=bfloat16 \
  --set model.conv_int8=true \
  > runs/prf_textured/quality_int8.txt 2>&1; step quality_int8 $?; }

# 4. the stem-4 throughput variant, for the record alongside
[ -s runs/bench_r3_stem4.json ] || { timeout 3600 python bench.py \
  --stem 4 --base 256 \
  > runs/bench_r3_stem4.json 2> runs/bench_r3_stem4.log; step bench_stem4 $?; }

echo "=== perf end $(date -u)" >> "$LOG"
