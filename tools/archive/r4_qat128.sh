#!/bin/bash
# Continuation of tools/r4_scope128.sh, launched separately so the QAT arm
# fits the end-of-round window: the parent queue's 11:20 deadline would have
# skipped the post-train evals, and its 4k-step budget is oversized now that
# the PTQ measurement exists — PTQ at min_cin=128 is 28.496 dB, only
# 0.031 dB outside the 0.05 budget, so a 2k-step scoped fine-tune (the same
# length that moved the all-conv gap in runs/QAT_VERDICT.json) + EMA-param
# eval is enough signal.  Promotion rule identical to the parent.
set -u
cd "$(dirname "$0")/.."
source tools/queue_lib.sh
queue_init runs/r4_qat128.log \
  "${QUEUE_DEADLINE:-$(date -d '2026-08-19 11:32 UTC' +%s)}"
wait_for_tpu 1800 30 || exit 1

REL=weights/prf_ema_r4.npz
WD=runs/r4_scope128
EV="python tools/quality_eval.py --preset config3_prf --set model.dtype=bfloat16"

run_step_retry 2 train_qat128 2400 $WD/TRAIN/DONE \
  python train.py --preset config3_prf \
    --set model.conv_int8_qat=true --set model.conv_int8_min_cin=128 \
    --set model.dtype=bfloat16 --set model.remat=true \
    --set data.loader=grain \
    --set optim.learning_rate=2.5e-5 --set optim.lr_decay_steps=100000 \
    --set checkpoint.save_interval_steps=2000 \
    --set checkpoint.keep_last_n=1 \
    --steps 2000 --init-from "$REL" --workdir $WD || exit 1

run_step eval_qat128_ema 1500 $WD/quality_256_qat128_ema.txt \
  $EV --checkpoint $WD/checkpoints --ema --set model.conv_int8=true \
      --set model.conv_int8_min_cin=128 \
      --json-out $WD/eval_256_qat128_ema.json
run_step eval_qat128_raw 1500 $WD/quality_256_qat128_raw.txt \
  $EV --checkpoint $WD/checkpoints --set model.conv_int8=true \
      --set model.conv_int8_min_cin=128 \
      --json-out $WD/eval_256_qat128_raw.json
run_step eval_qat128_bf16ema 1500 $WD/quality_256_qat128_bf16ema.txt \
  $EV --checkpoint $WD/checkpoints --ema \
      --json-out $WD/eval_256_qat128_bf16ema.json

python - "$REL" "$WD" <<'PYEOF' >> "$QUEUE_LOG" 2>&1
import json, sys
rel, wd = sys.argv[1], sys.argv[2]
from bin_tpu.weights import read_card
record = read_card(rel)["metadata"]["psnr_overall"]
def overall(p):
    try: return json.load(open(p))["model"]["psnr_overall"]
    except Exception: return None
ema = overall(f"{wd}/eval_256_qat128_ema.json")
raw = overall(f"{wd}/eval_256_qat128_raw.json")
bf16 = overall(f"{wd}/eval_256_qat128_bf16ema.json")
cand = [(v, n) for v, n in ((ema, "ema"), (raw, "raw")) if v is not None]
best, params = max(cand) if cand else (None, None)
v0 = json.load(open(f"{wd}/SCOPE128_VERDICT.json"))
verdict = dict(mode="qat_min_cin_128_2k", int8c128_ema=ema, int8c128_raw=raw,
               bf16_ema=bf16, best_params=params, record=record,
               record_source=rel, budget=0.05,
               fps128=v0.get("fps128"),
               fps_control_same_session=v0.get("fps_control_same_session"),
               flip=bool(best and best >= record - 0.05 and v0.get("fps_gains")))
json.dump(verdict, open(f"{wd}/QAT128_VERDICT.json", "w"), indent=1)
print("qat128 verdict:", verdict)
if verdict["flip"]:
    json.dump({"overrides": {"model.conv_int8_min_cin": 128},
               "reason": (f"scoped int8-QAT (min_cin=128, 2k steps, "
                          f"params={params}) holds the budget: {best:.4f} dB "
                          f"vs record {record:.4f} from {rel} (budget 0.05); "
                          f"fps {v0.get('fps_control_same_session')}->"
                          f"{v0.get('fps128')} same-session - "
                          f"runs/r4_scope128/QAT128_VERDICT.json")},
              open("runs/BENCH_OVERRIDES.json", "w"), indent=1)
    print("BENCH_OVERRIDES.json written: min_cin=128 serving default")
PYEOF

echo "=== r4_qat128 done $(date -u)" >> "$QUEUE_LOG"
