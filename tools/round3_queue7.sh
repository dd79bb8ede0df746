#!/bin/bash
# Round-3 phase 9: runs after the 50k extended run's queue (queue6b)
# finishes. Same-session A/B of the Pallas input-pack kernel
# (model.s2d_pallas) against the default bench — cross-session absolute
# fps drift ±40% (BASELINE.md), so only same-session pairs are
# comparable. The control arm doubles as the post-edit sanity run of
# bench.py's new device-wait path.
set -u
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR="${JAX_COMPILATION_CACHE_DIR:-/root/repo/.jax_cache}"
LOG=runs/round3_queue7.log
echo "=== queue7 start $(date -u)" >> "$LOG"
b() { local out="$1"; shift
  [ -s "$out" ] && return
  timeout 3600 python bench.py "$@" > "$out" 2> "${out%.json}.log"
  echo "--- $(basename $out) rc=$? $(date -u)" >> "$LOG"; }
b runs/bench_r3_q7_control.json
b runs/bench_r3_q7_s2dpallas.json --set model.s2d_pallas=true
echo "=== queue7 end $(date -u)" >> "$LOG"
