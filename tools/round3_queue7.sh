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
# No arm STARTS after 05:45 UTC 2026-08-18 (each is bounded by 1 h), so
# the chip is guaranteed free for the driver's 07:00 round-end bench.
DEADLINE="${QUEUE7_DEADLINE:-1787031900}"
b() { local out="$1"; shift
  [ -s "$out" ] && return
  if [ "$(date +%s)" -ge "$DEADLINE" ]; then
    echo "--- $(basename $out) SKIPPED (past deadline) $(date -u)" >> "$LOG"
    return
  fi
  timeout 3600 python bench.py "$@" > "$out" 2> "${out%.json}.log"
  echo "--- $(basename $out) rc=$? $(date -u)" >> "$LOG"; }
b runs/bench_r3_q7_control.json
b runs/bench_r3_q7_s2dpallas.json --set model.s2d_pallas=true
echo "=== queue7 end $(date -u)" >> "$LOG"
