#!/bin/bash
# Round-4 int8 QAT fine-tune (VERDICT r3 item 3, re-armed from round 3's
# killed queue8): 2k steps of fake-quant fine-tuning from the round-4
# release weights, then pinned-protocol evals under the all-conv int8
# serving graph (the thing we'd ship), plain bf16 (drift check), and the
# current Cin>=256 serving default (control).
#
# Promotion rule: bench.py's serving default flips to ALL-conv int8 only if
# the fine-tuned weights hold the 0.05 dB budget against the round-4 record
# (read from the release card — not hand-written).  Verdict JSON + optional
# BENCH_OVERRIDES.json are written either way.
#
# Usage: tools/r4_qat.sh [RELEASE_NPZ]   (default weights/prf_ema_r4.npz)
set -u
cd "$(dirname "$0")/.."
source tools/queue_lib.sh
queue_init runs/r4_qat.log "${QUEUE_DEADLINE:-}"

REL="${1:-weights/prf_ema_r4.npz}"
WD=runs/prf_qat_r4
EV="python tools/quality_eval.py --checkpoint $WD/checkpoints --preset config3_prf --set model.dtype=bfloat16"

[ -s "$REL" ] || { _qlog "release $REL missing — aborting"; exit 1; }

run_step_retry 2 train_qat 4500 $WD/TRAIN/DONE \
  python train.py --preset config3_prf \
    --set model.conv_int8_qat=true --set model.dtype=bfloat16 \
    --set model.remat=true --set data.loader=grain \
    --set optim.learning_rate=2.5e-5 --set optim.lr_decay_steps=100000 \
    --set checkpoint.save_interval_steps=2000 --set checkpoint.keep_last_n=1 \
    --steps 2000 --init-from "$REL" --workdir $WD || exit 1

run_step eval_qat_int8all 2400 $WD/quality_256_int8all.txt \
  $EV --set model.conv_int8=true --json-out $WD/eval_256_int8all.json
run_step eval_qat_bf16 2400 $WD/quality_256_bf16.txt \
  $EV --json-out $WD/eval_256_bf16.json
run_step eval_qat_int8c256 2400 $WD/quality_256_int8c256.txt \
  $EV --set model.conv_int8=true --set model.conv_int8_min_cin=256 \
  --json-out $WD/eval_256_int8c256.json

python - "$REL" <<'PYEOF' >> "$QUEUE_LOG" 2>&1
import json, sys
rel = sys.argv[1]
from bin_tpu.weights import read_card
record = read_card(rel)["metadata"]["psnr_overall"]  # provenance-guarded
def overall(p):
    try:
        return json.load(open(p))["model"]["psnr_overall"]
    except Exception:
        return None
int8 = overall("runs/prf_qat_r4/eval_256_int8all.json")
bf16 = overall("runs/prf_qat_r4/eval_256_bf16.json")
verdict = dict(int8all_psnr=int8, bf16_psnr=bf16, record=record,
               record_source=rel, budget=0.05,
               flip=bool(int8 and int8 >= record - 0.05))
json.dump(verdict, open("runs/QAT_VERDICT.json", "w"), indent=1)
print("QAT verdict:", verdict)
if verdict["flip"]:
    json.dump({"overrides": {"model.conv_int8_min_cin": 0},
               "reason": (f"int8-QAT fine-tune holds the budget: all-conv "
                          f"int8 eval {int8:.4f} dB vs record {record:.4f} "
                          f"from {rel} (budget 0.05) - runs/QAT_VERDICT.json")},
              open("runs/BENCH_OVERRIDES.json", "w"), indent=1)
    print("BENCH_OVERRIDES.json written: all-conv int8 serving default")
PYEOF

# export the fine-tuned weights with their eval provenance (headline = the
# int8-all serving eval — the graph these weights exist for)
if [ -s runs/QAT_VERDICT.json ] && [ -s $WD/eval_256_int8all.json ]; then
  run_step export_qat 1200 $WD/EXPORT/DONE \
    python -c "from bin_tpu.cli import export_main; export_main(
      ['--preset','config3_prf','--checkpoint','$WD/checkpoints',
       '--out','weights/prf_qat_r4.npz','--store-dtype','float16',
       '--eval-json','$WD/eval_256_int8all.json',
       '--eval-json','$WD/eval_256_bf16.json',
       '--note','2k-step int8 QAT fine-tune of $REL (headline eval: all-conv int8 serving graph)'])"
fi
echo "=== r4_qat done $(date -u)" >> "$QUEUE_LOG"
