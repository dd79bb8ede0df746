#!/bin/bash
# Second attempt at the scoped (min_cin=128) int8 QAT promotion: the first
# (tools/r4_qat128.sh) trained WITHOUT optim.ema_decay — the preset does not
# carry EMA; the flagship passes it explicitly — and its raw 2k-step result
# came out BELOW the PTQ baseline (28.423 vs 28.496: fine-tune drift exceeds
# the quantization adaptation).  Same recipe + EMA(0.999) tracking, eval the
# EMA params under the int8c128 serving graph, same promotion rule.
set -u
cd "$(dirname "$0")/.."
source tools/queue_lib.sh
queue_init runs/r4_qat128b.log \
  "${QUEUE_DEADLINE:-$(date -d '2026-08-19 11:40 UTC' +%s)}"
wait_for_tpu 900 20 || exit 1

REL=weights/prf_ema_r4.npz
WD=runs/r4_qat128b
EV="python tools/quality_eval.py --preset config3_prf --set model.dtype=bfloat16"

run_step_retry 2 train_qat128b 2400 $WD/TRAIN/DONE \
  python train.py --preset config3_prf \
    --set model.conv_int8_qat=true --set model.conv_int8_min_cin=128 \
    --set model.dtype=bfloat16 --set model.remat=true \
    --set data.loader=grain --set optim.ema_decay=0.999 \
    --set optim.learning_rate=2.5e-5 --set optim.lr_decay_steps=100000 \
    --set checkpoint.save_interval_steps=2000 \
    --set checkpoint.keep_last_n=1 \
    --steps 2000 --init-from "$REL" --workdir $WD || exit 1

run_step eval_qat128b_ema 1500 $WD/quality_256_qat128b_ema.txt \
  $EV --checkpoint $WD/checkpoints --ema --set model.conv_int8=true \
      --set model.conv_int8_min_cin=128 \
      --json-out $WD/eval_256_qat128b_ema.json

python - "$REL" "$WD" <<'PYEOF' >> "$QUEUE_LOG" 2>&1
import json, sys
rel, wd = sys.argv[1], sys.argv[2]
from bin_tpu.weights import read_card
record = read_card(rel)["metadata"]["psnr_overall"]
def overall(p):
    try: return json.load(open(p))["model"]["psnr_overall"]
    except Exception: return None
ema = overall(f"{wd}/eval_256_qat128b_ema.json")
v0 = json.load(open("runs/r4_scope128/SCOPE128_VERDICT.json"))
verdict = dict(mode="qat_min_cin_128_2k_ema", int8c128_ema=ema,
               record=record, record_source=rel, budget=0.05,
               fps128=v0.get("fps128"),
               fps_control_same_session=v0.get("fps_control_same_session"),
               flip=bool(ema and ema >= record - 0.05 and v0.get("fps_gains")))
json.dump(verdict, open(f"{wd}/QAT128B_VERDICT.json", "w"), indent=1)
print("qat128b verdict:", verdict)
if verdict["flip"]:
    json.dump({"overrides": {"model.conv_int8_min_cin": 128},
               "reason": (f"scoped int8-QAT (min_cin=128, 2k steps, EMA "
                          f"params) holds the budget: {ema:.4f} dB vs "
                          f"record {record:.4f} from {rel} (budget 0.05); "
                          f"fps {v0.get('fps_control_same_session')}->"
                          f"{v0.get('fps128')} same-session - "
                          f"runs/r4_qat128b/QAT128B_VERDICT.json")},
              open("runs/BENCH_OVERRIDES.json", "w"), indent=1)
    print("BENCH_OVERRIDES.json written: min_cin=128 serving default")
PYEOF

echo "=== r4_qat128b done $(date -u)" >> "$QUEUE_LOG"
