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
# No arm STARTS after 07:30 UTC 2026-08-18 (each is bounded by 1 h).
# Session-3 revision: the original 05:45 assumed the round could end
# ~08:30; session 3 began 00:26 UTC with a fresh ~12 h budget, so the
# earliest plausible round end moved to ~10:00+ — 07:30 + 1 h arms still
# frees the chip with >1 h margin while avoiding an idle-chip gap when
# the tunnel returns mid-morning.
DEADLINE="${QUEUE7_DEADLINE:-1787038200}"
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
