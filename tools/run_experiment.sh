#!/bin/bash
# One parameterized serving-mode experiment: eval -> bench(arm) ->
# bench(control, same session) -> auto-verdict against the release card's
# record, with optional measurement-gated promotion to the bench default.
#
# This is the proven round-4 chain (tools/archive/r4_lstm_int8.sh was the
# template) promoted into a reusable driver (VERDICT r4 weak #3 / task 6),
# so a fresh session queues a gated experiment with ONE command instead of
# writing a new round-scoped script.
#
# Usage:
#   tools/run_experiment.sh NAME [--no-eval] [--promote] [--weights REL]
#                           [--bench-arg ARG]... [KEY=VALUE]...
#
#   NAME        experiment id; artifacts land in runs/NAME/ (idempotent —
#               re-running skips completed steps, queue_lib.sh semantics)
#   KEY=VALUE   config overrides defining the arm (e.g. model.s2d_via_conv=true)
#   --no-eval   skip the quality eval: the arm is bit-exact by construction
#               (impl-only flags) so quality_holds is recorded as true
#   --promote   if the verdict flips (quality holds AND fps > 1.01x control),
#               MERGE the arm overrides into runs/BENCH_OVERRIDES.json so the
#               round-end bench measures the proven-faster mode
#   --weights   release .npz whose params the eval runs (default:
#               highest-psnr committed card)
#   --record    release .npz whose card defines the quality-record floor
#               (default: the highest-psnr committed card, NOT --weights —
#               an experiment on a side release must still clear the
#               repo's standing record budget)
#   --bench-arg extra literal argument passed to the ARM bench only
#               (e.g. --bench-arg --stem --bench-arg 4 for variant rows)
#
# Promotion rule (standing, BASELINE.md): flip a serving default only when
# the pinned-protocol eval stays within 0.05 dB of the record AND the arm
# gains >1% fps over a SAME-SESSION control (cross-session drift is +-40%).
set -u
cd "$(dirname "$0")/.."
source tools/queue_lib.sh

NAME="${1:?usage: run_experiment.sh NAME [--no-eval] [--promote] [KEY=VALUE...]}"
shift
DO_EVAL=1 PROMOTE=0 REL="" RECORD_REL="" BENCH_ARGS=() OVERRIDES=()
while [ $# -gt 0 ]; do
  case "$1" in
    --no-eval) DO_EVAL=0 ;;
    --promote) PROMOTE=1 ;;
    --weights) REL="$2"; shift ;;
    --record) RECORD_REL="$2"; shift ;;
    --bench-arg) BENCH_ARGS+=("$2"); shift ;;
    *=*) OVERRIDES+=("$1") ;;
    *) echo "unknown arg: $1" >&2; exit 2 ;;
  esac
  shift
done

WD="runs/$NAME"
mkdir -p "$WD"
queue_init "$WD/chain.log" "${QUEUE_DEADLINE:-}"
wait_for_tpu 1800 30 || exit 1

# default release / record = the quality record: the shared pinned-protocol
# picker (benchmark.best_pinned_release) — NOT a bare max over all cards,
# which a card evaluated at another size would win on a non-comparable
# number and silently become every experiment's gate (ADVICE r4)
if [ -z "$REL" ] || [ -z "$RECORD_REL" ]; then
  BEST=$(python - <<'PYEOF'
from bin_tpu.benchmark import best_pinned_release
best = best_pinned_release()
print(best[0] if best else "")
PYEOF
)
  [ -n "$BEST" ] || { echo "no card-carrying release found" >&2; exit 1; }
  [ -n "$REL" ] || REL="$BEST"
  [ -n "$RECORD_REL" ] || RECORD_REL="$BEST"
fi
_qlog "$NAME: arm={${OVERRIDES[*]:-}} eval_weights=$REL record=$RECORD_REL eval=$DO_EVAL promote=$PROMOTE"

# --- 1. quality eval: the bench's effective serving mode + the arm --------
if [ "$DO_EVAL" = 1 ]; then
  # mirror what bench.py runs: its built-in serving defaults, then any
  # standing BENCH_OVERRIDES promotions, then this arm
  mapfile -t EVAL_SETS < <(python - "${OVERRIDES[@]}" <<'PYEOF'
import json, os, sys
from bin_tpu.benchmark import SERVING_MODE
sets = list(SERVING_MODE)
if os.path.exists("runs/BENCH_OVERRIDES.json"):
    ov = json.load(open("runs/BENCH_OVERRIDES.json")).get("overrides", {})
    sets += [f"{k}={v}" for k, v in ov.items()]
sets += sys.argv[1:]
for s in sets:
    print(s)
PYEOF
)
  EV_ARGS=()
  for s in "${EVAL_SETS[@]}"; do EV_ARGS+=(--set "$s"); done
  run_step eval 1800 "$WD/quality_256.txt" \
    python tools/quality_eval.py --preset config3_prf --checkpoint "$REL" \
      "${EV_ARGS[@]}" --json-out "$WD/eval_256.json"
fi

# --- 2. arm bench + 3. same-session control bench --------------------------
ARM_ARGS=()
for s in "${OVERRIDES[@]:-}"; do [ -n "$s" ] && ARM_ARGS+=(--set "$s"); done
run_step bench_arm 2400 "$WD/bench_arm.json" \
  python bench.py "${BENCH_ARGS[@]}" "${ARM_ARGS[@]}"
run_step bench_control 2400 "$WD/bench_control.json" \
  python bench.py

# --- 4. verdict vs the card, optional gated promotion ----------------------
python - "$NAME" "$RECORD_REL" "$DO_EVAL" "$PROMOTE" "${OVERRIDES[@]:-}" <<'PYEOF' >> "$QUEUE_LOG" 2>&1
import json, sys
name, rel, do_eval, promote = sys.argv[1:5]
overrides = [s for s in sys.argv[5:] if s]
wd = f"runs/{name}"
from bin_tpu.weights import read_card
record = read_card(rel)["metadata"]["psnr_overall"]

def get(path, *ks):
    """Whole-file JSON first (eval artifacts are pretty-printed docs);
    fall back to the LAST {-line for bench artifacts with log preamble."""
    try:
        text = open(path).read()
        try:
            v = json.loads(text)
        except ValueError:
            line = [l for l in text.splitlines()
                    if l.strip().startswith("{")][-1]
            v = json.loads(line)
        for k in ks:
            v = v[k]
        return v
    except Exception:
        return None

psnr = get(f"{wd}/eval_256.json", "model", "psnr_overall") \
    if do_eval == "1" else None
fps_arm = get(f"{wd}/bench_arm.json", "value")
fps_ctl = get(f"{wd}/bench_control.json", "value")
ok_q = (psnr is not None and psnr >= record - 0.05) if do_eval == "1" \
    else True  # --no-eval arms are bit-exact by construction
ok_f = bool(fps_arm and fps_ctl and fps_arm > fps_ctl * 1.01)
verdict = dict(
    name=name, overrides=overrides, psnr=psnr, record=record,
    record_source=rel, budget=0.05, bit_exact=do_eval != "1",
    fps_arm=fps_arm, fps_control_same_session=fps_ctl,
    quality_holds=ok_q, fps_gains=ok_f, flip=ok_q and ok_f)
json.dump(verdict, open(f"{wd}/VERDICT.json", "w"), indent=1)
print(f"{name} verdict:", verdict)

if promote == "1" and verdict["flip"]:
    # MERGE into the standing promotions (never clobber earlier winners)
    path = "runs/BENCH_OVERRIDES.json"
    try:
        cur = json.load(open(path))
    except Exception:
        cur = {"overrides": {}, "reason": ""}
    for s in overrides:
        k, v = s.split("=", 1)
        cur["overrides"][k] = {"true": True, "false": False}.get(v.lower(), v)
    q = f"{psnr:.4f} dB vs record {record:.4f} (budget 0.05)" \
        if psnr is not None else "bit-exact arm"
    add = (f"[{name}] {'+'.join(overrides)}: {q}, fps "
           f"{fps_ctl:.2f}->{fps_arm:.2f} same-session - {wd}/VERDICT.json")
    cur["reason"] = (cur.get("reason", "") + " | " + add).strip(" |")
    json.dump(cur, open(path, "w"), indent=1)
    print(f"BENCH_OVERRIDES.json merged: {overrides}")
PYEOF

echo "=== run_experiment $NAME done $(date -u)" >> "$QUEUE_LOG"
