#!/bin/bash
# Gated QAT fine-tune chain: train (fake-quant, scoped) from a released
# checkpoint -> eval the EMA params under the REAL int8 serving graph ->
# if the pinned eval holds the record budget, export a card-carrying
# release and merge the serving-scope promotion into BENCH_OVERRIDES.
#
# The quality gate is the standing promotion rule (BASELINE.md): the eval
# must stay within 0.05 dB of the committed record. The fps side must
# already be proven by a same-session bench pair (pass its VERDICT.json
# via FPS_VERDICT so the promotion reason cites real numbers).
#
# Usage: tools/qat_finetune.sh NAME STEPS LR MIN_CIN [INIT_RELEASE]
#   e.g. tools/qat_finetune.sh r5_qat10k 10000 1e-5 128
# Env: FPS_VERDICT=runs/r5_int8c128/VERDICT.json (fps evidence to cite)
set -u
cd "$(dirname "$0")/.."
source tools/queue_lib.sh

NAME="${1:?usage: qat_finetune.sh NAME STEPS LR MIN_CIN [INIT_RELEASE]}"
STEPS="${2:?}"
LR="${3:?}"
MIN_CIN="${4:?}"
REL="${5:-weights/prf_ema_r4.npz}"
FPS_VERDICT="${FPS_VERDICT:-}"

WD="runs/$NAME"
mkdir -p "$WD"
queue_init "$WD/chain.log" "${QUEUE_DEADLINE:-}"
wait_for_tpu 3600 30 || exit 1

# --- 1. scoped QAT fine-tune (EMA tracked; --init-from re-seats the EMA
#        shadow since commit 9247a7b, so the EMA eval is sound) -----------
run_step train 14400 "$WD/TRAIN/DONE" \
  python train.py --preset config3_prf \
    --set model.conv_int8_qat=true --set "model.conv_int8_min_cin=$MIN_CIN" \
    --set model.dtype=bfloat16 --set model.remat=true \
    --set data.loader=grain --set optim.ema_decay=0.999 \
    --set "optim.learning_rate=$LR" --set optim.lr_decay_steps=1000000 \
    --set checkpoint.save_interval_steps=2000 --set checkpoint.keep_last_n=1 \
    --steps "$STEPS" --init-from "$REL" --workdir "$WD" || exit 1

# --- 2. eval the EMA params under the REAL serving graph (scoped int8
#        PTQ at the new min_cin + the promoted int8 LSTM gates) -----------
run_step eval_ema 1800 "$WD/quality_256_ema.txt" \
  python tools/quality_eval.py --preset config3_prf \
    --checkpoint "$WD/checkpoints" --ema \
    --set model.dtype=bfloat16 --set model.conv_int8=true \
    --set "model.conv_int8_min_cin=$MIN_CIN" \
    --set model.conv_int8_lstm=true \
    --json-out "$WD/eval_256_ema.json"

# --- 3. verdict + conditional export & promotion ---------------------------
python - "$NAME" "$REL" "$MIN_CIN" "$STEPS" "$LR" "$FPS_VERDICT" <<'PYEOF' >> "$QUEUE_LOG" 2>&1
import json, os, subprocess, sys
name, rel, min_cin, steps, lr, fps_verdict = sys.argv[1:7]
wd = f"runs/{name}"
from bin_tpu.weights import read_card
record = read_card(rel)["metadata"]["psnr_overall"]
try:
    psnr = json.load(open(f"{wd}/eval_256_ema.json"))["model"]["psnr_overall"]
except Exception:
    psnr = None
fps = {}
if fps_verdict and os.path.exists(fps_verdict):
    fps = json.load(open(fps_verdict))
ok_q = bool(psnr and psnr >= record - 0.05)
verdict = dict(name=name, mode=f"qat_min_cin_{min_cin}_{steps}step_lr{lr}",
               psnr_ema_int8=psnr, record=record, record_source=rel,
               budget=0.05, quality_holds=ok_q,
               fps_arm=fps.get("fps_arm"),
               fps_control_same_session=fps.get("fps_control_same_session"),
               fps_gains=fps.get("fps_gains"),
               flip=ok_q and bool(fps.get("fps_gains")))
json.dump(verdict, open(f"{wd}/QAT_VERDICT.json", "w"), indent=1)
print("qat verdict:", verdict)
if not verdict["flip"]:
    sys.exit(0)

out = f"weights/prf_qat{min_cin}_ema.npz"
r = subprocess.run([sys.executable, "-c", f"""
from bin_tpu.cli import export_main
export_main(['--preset','config3_prf','--checkpoint','{wd}/checkpoints',
             '--out','{out}','--ema','--store-dtype','float16',
             '--eval-json','{wd}/eval_256_ema.json',
             '--note','scoped int8 QAT fine-tune (min_cin={min_cin}, {steps} steps, lr {lr}) from {rel}; headline eval runs under the int8 serving graph it was trained for'])
"""])
if r.returncode:
    print("EXPORT FAILED - promotion aborted"); sys.exit(1)
path = "runs/BENCH_OVERRIDES.json"
try:
    cur = json.load(open(path))
except Exception:
    cur = {"overrides": {}, "reason": ""}
cur["overrides"]["model.conv_int8_min_cin"] = int(min_cin)
add = (f"[{name}] scoped QAT holds the budget under the int8 serving "
       f"graph: {psnr:.4f} dB vs record {record:.4f} (budget 0.05, "
       f"released as {out}); fps {fps.get('fps_control_same_session')}->"
       f"{fps.get('fps_arm')} same-session - {wd}/QAT_VERDICT.json")
cur["reason"] = (cur.get("reason", "") + " | " + add).strip(" |")
json.dump(cur, open(path, "w"), indent=1)
print(f"BENCH_OVERRIDES.json merged: min_cin={min_cin}; released {out}")
PYEOF

echo "=== qat_finetune $NAME done $(date -u)" >> "$QUEUE_LOG"
