#!/bin/bash
# Round-4 finalizer: waits for the r4_flagship chain to finish (or die),
# picks the best pinned-protocol eval point as the release of record,
# re-exports from the 50k checkpoint when it beats the 20k insurance
# export, then runs the QAT fine-tune chain and the on-chip perf arms.
#
# Everything downstream is idempotent (queue_lib.sh stamps); this script is
# itself safe to re-launch.  It never git-commits — the session (or the
# driver's end-of-round sweep) commits the artifacts it leaves on disk.
set -u
cd "$(dirname "$0")/.."
source tools/queue_lib.sh
queue_init runs/r4_finalize.log "${QUEUE_DEADLINE:-}"

WD=runs/prf_r4
REL=weights/prf_ema_r4.npz

# --- wait for the flagship chain (complete line, or its process gone) ----
while true; do
  grep -q "r4_flagship chain complete" runs/r4_flagship.log 2>/dev/null && break
  if [ -f /tmp/r4_flagship.pid ] && ! kill -0 "$(cat /tmp/r4_flagship.pid)" 2>/dev/null; then
    _qlog "flagship chain process gone without completion line — proceeding with best available"
    break
  fi
  sleep 60
done
_qlog "flagship chain settled"

# --- pick the release of record ------------------------------------------
python - <<'PYEOF' > runs/r4_release_choice.json 2>> "$QUEUE_LOG"
import json, os
def overall(p):
    try:
        return json.load(open(p))["model"]["psnr_overall"]
    except Exception:
        return None
points = {s: overall(f"runs/prf_r4/eval_256_ema_{s}.json") for s in ("20k", "35k", "50k")}
scored = {s: v for s, v in points.items() if v is not None}
best = max(scored, key=scored.get) if scored else None
# only 45k/50k checkpoints survive keep_last_n=2; 20k survives as the npz
reexport = best == "50k" or (best == "35k" and points.get("50k") is None
                             and os.path.isdir("runs/prf_r4/checkpoints"))
print(json.dumps(dict(points=points, best=best, reexport_from_ckpt=bool(reexport))))
PYEOF
cat runs/r4_release_choice.json >> "$QUEUE_LOG"

if grep -q '"reexport_from_ckpt": true' runs/r4_release_choice.json; then
  EV_JSONS=()
  for f in $WD/eval_256_ema_50k.json $WD/eval_352x640_ema_50k.json \
           $WD/eval_256_ema_35k.json; do
    [ -s "$f" ] && EV_JSONS+=(--eval-json "$f")
  done
  run_step export_final 1200 $WD/EXPORT_FINAL/DONE \
    python -c "
import sys
from bin_tpu.cli import export_main
export_main(['--preset','config3_prf','--checkpoint','$WD/checkpoints',
             '--out','$REL','--ema','--store-dtype','float16']
            + sys.argv[1:]
            + ['--note','config3 pixel-only + EMA(0.999), latest checkpoint of the 50k r4 run, textured synthetic'])
" "${EV_JSONS[@]}"
fi

# --- downstream chains (each internally idempotent) -----------------------
if [ -s "$REL" ]; then
  bash tools/r4_qat.sh "$REL"
fi
SERVING_WEIGHTS="$REL" bash tools/r4_perf.sh

echo "=== r4_finalize done $(date -u)" >> "$QUEUE_LOG"
