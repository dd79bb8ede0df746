# Generic wait-then-run experiment queue helpers (consolidates the proven
# round-3 tools/round3_queue*.sh pattern — VERDICT r3 item 8).
#
# Usage from a short plan script:
#
#   #!/bin/bash
#   set -u
#   cd "$(dirname "$0")/.."
#   source tools/queue_lib.sh
#   queue_init runs/myplan.log [DEADLINE_EPOCH]
#   wait_for_tpu 7200                     # optional: bounded tunnel wait
#   run_step NAME 3600 runs/out.txt CMD ARGS...   # skipped if out non-empty
#   run_step train 14400 runs/run/DONE python train.py ...
#
# Semantics (all battle-tested against the round-3 tunnel outage):
#   * every step is `timeout`-bounded; rc and UTC time are logged;
#   * a step whose DONE file is already non-empty is skipped (idempotent
#     re-runs after a crash/VM reset resume where they left off);
#   * if DONE ends in /DONE it is touch-stamped on rc=0 (for commands that
#     write a directory, e.g. training workdirs); otherwise the step's
#     stdout+stderr go TO the DONE file (for evals/benches whose output IS
#     the artifact);
#   * no step STARTS after the optional deadline (so a queued chain can
#     never collide with the driver's end-of-round bench) — set it with
#     queue_init LOG DEADLINE_EPOCH or the QUEUE_DEADLINE env var.

QUEUE_LOG=""
QUEUE_DEADLINE="${QUEUE_DEADLINE:-}"

queue_init() {
  QUEUE_LOG="$1"
  [ $# -ge 2 ] && QUEUE_DEADLINE="$2"
  mkdir -p "$(dirname "$QUEUE_LOG")"
  export JAX_COMPILATION_CACHE_DIR="${JAX_COMPILATION_CACHE_DIR:-$PWD/.jax_cache}"
  echo "=== queue start $(date -u)${QUEUE_DEADLINE:+ (deadline $(date -u -d @$QUEUE_DEADLINE 2>/dev/null || echo $QUEUE_DEADLINE))}" >> "$QUEUE_LOG"
}

_qlog() { echo "--- $* $(date -u)" >> "$QUEUE_LOG"; }

_past_deadline() {
  [ -n "$QUEUE_DEADLINE" ] && [ "$(date +%s)" -ge "$QUEUE_DEADLINE" ]
}

# run_step NAME TIMEOUT_S DONE_FILE CMD [ARGS...] -> returns the step's rc
# (0 when skipped as already done; 75 = EX_TEMPFAIL when deadline-skipped).
run_step() {
  local name="$1" tmo="$2" done_file="$3"; shift 3
  if [ -s "$done_file" ] || { [ "${done_file##*/}" = DONE ] && [ -e "$done_file" ]; }; then
    _qlog "$name SKIPPED (already done)"; return 0
  fi
  if _past_deadline; then _qlog "$name SKIPPED (past deadline)"; return 75; fi
  local rc
  if [ "${done_file##*/}" = DONE ]; then
    mkdir -p "$(dirname "$done_file")"
    timeout "$tmo" "$@" >> "${done_file%/DONE}.log" 2>&1; rc=$?
    [ $rc -eq 0 ] && touch "$done_file"
  else
    mkdir -p "$(dirname "$done_file")"
    timeout "$tmo" "$@" > "$done_file" 2>&1; rc=$?
    # a failed step must not leave a truncated artifact that later re-runs
    # mistake for done — keep it for debugging under <file>.failed instead
    [ $rc -ne 0 ] && mv "$done_file" "$done_file.failed"
  fi
  _qlog "$name rc=$rc"
  return $rc
}

# Retry wrapper for steps that can die retryably (StallWatchdog exit 91,
# timeout 124): run_step_retry RETRIES NAME TIMEOUT_S DONE_FILE CMD...
run_step_retry() {
  local tries="$1"; shift
  local rc=1
  for attempt in $(seq 1 "$tries"); do
    run_step "$1(attempt$attempt)" "$2" "$3" "${@:4}"; rc=$?
    [ $rc -eq 0 ] && return 0
    [ $rc -eq 91 ] || [ $rc -eq 124 ] || return $rc
  done
  return $rc
}

# Bounded wait for the axon TPU tunnel (probes are timeout-bounded because
# a down tunnel can either fail fast or wedge >10 min — BASELINE.md outage
# log).  wait_for_tpu MAX_WAIT_S [PROBE_INTERVAL_S]
wait_for_tpu() {
  local max="${1:-7200}" interval="${2:-120}" t0
  t0=$(date +%s)
  while true; do
    # Probe COMPUTE + a host fetch, not just device listing: the tunnel's
    # wedge mode (rounds 3-5) keeps jax.devices() working while dispatch
    # blocks indefinitely, so a listing-only probe waves a dead chip
    # through and every queued step then burns its full timeout.
    timeout 600 python -c "
import jax, jax.numpy as jnp
print(jax.devices())
x = jnp.ones((256, 256))
print('compute ok', float((x @ x).sum()))" >> "$QUEUE_LOG" 2>&1 \
      && { _qlog "tpu up"; return 0; }
    _qlog "tpu probe failed"
    [ $(( $(date +%s) - t0 )) -ge "$max" ] && { _qlog "tpu wait EXPIRED"; return 1; }
    sleep "$interval"
  done
}
