#!/bin/bash
# Round-3 measurement pass (phase 1, run right after the flagship training
# run finishes): pinned-protocol quality evals for the stem-4 flagship and
# the round-2 stem-2 checkpoint at BOTH 256^2 and the declared 352x640
# protocol (VERDICT r2 items 1 & 7), then the async-drain serving benches
# (item 8).
set -u
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR="${JAX_COMPILATION_CACHE_DIR:-/root/repo/.jax_cache}"
LOG=runs/round3_measure.log
echo "=== measure start $(date -u)" >> "$LOG"

q() {  # outfile preset checkpoint size...
  local out="$1" preset="$2" ckpt="$3"; shift 3
  [ -s "$out" ] && { echo "skip $out" >> "$LOG"; return; }
  timeout 3600 python tools/quality_eval.py --checkpoint "$ckpt" \
    --preset "$preset" --size "$@" > "$out" 2>&1
  echo "--- $out rc=$? $(date -u)" >> "$LOG"
}

# flagship stem-4 (Run A) at both protocol resolutions
q runs/flagship_textured/quality_256.txt config5_v5e_streaming \
  runs/flagship_textured/checkpoints 256
q runs/flagship_textured/quality_352x640.txt config5_v5e_streaming \
  runs/flagship_textured/checkpoints 352 640

# round-2 stem-2 checkpoint at the DECLARED protocol resolution (item 7;
# its 256^2 numbers are already recorded in BASELINE.md)
timeout 3600 python tools/quality_eval.py \
  --checkpoint runs/prf_textured/checkpoints --preset config3_prf \
  --set model.dtype=bfloat16 --size 352 640 \
  > runs/prf_textured/quality_352x640.txt 2>&1
echo "--- prf_textured 352x640 rc=$? $(date -u)" >> "$LOG"

# serving: async overlapped drain vs buffered, 2x720p streams (item 8)
for mode in "--async-drain" "--drain-every 1" "--drain-every 8"; do
  tag=$(echo "$mode" | tr -d ' -')
  timeout 3600 python bench.py --streaming --batch 2 --keys 8 --iters 4 \
    $mode > "runs/serving_${tag}.json" 2> "runs/serving_${tag}.log"
  echo "--- serving $mode rc=$? $(date -u)" >> "$LOG"
done

echo "=== measure end $(date -u)" >> "$LOG"
