#!/bin/bash
# Round-4: extend int8 PTQ to the ConvLSTM gate conv (model.conv_int8_lstm).
# The serving trace leaves the k(3,3,768,1024) gate conv in bf16 (~3.4 ms of
# 81) because the backbone-only scoping never reached it; the conv is now
# quantized as conv(x,Kx)+conv(h,Kh) with independent activation scales (the
# joint concat form crushes the (-1,1) hidden state under one abs-max scale
# — convlstm.py).  Same measurement-gated promotion rule as every int8
# scope: flip only if record-0.05 dB holds AND same-session fps gains >1%.
set -u
cd "$(dirname "$0")/.."
source tools/queue_lib.sh
queue_init runs/r4_lstm_int8.log "${QUEUE_DEADLINE:-}"
wait_for_tpu 1800 30 || exit 1

REL=weights/prf_ema_r4.npz
WD=runs/r4_lstm_int8
EV="python tools/quality_eval.py --preset config3_prf --set model.dtype=bfloat16"
mkdir -p $WD

run_step eval_lstm_int8 1800 $WD/quality_256_lstmint8.txt \
  $EV --checkpoint $REL --set model.conv_int8=true \
      --set model.conv_int8_min_cin=256 --set model.conv_int8_lstm=true \
      --json-out $WD/eval_256_lstmint8.json
run_step bench_lstm_int8 2400 runs/bench_r4_lstmint8.json \
  python bench.py --set model.conv_int8_lstm=true
run_step bench_control3 2400 runs/bench_r4_control3.json \
  python bench.py

python - "$REL" "$WD" <<'PYEOF' >> "$QUEUE_LOG" 2>&1
import json, sys
rel, wd = sys.argv[1], sys.argv[2]
from bin_tpu.weights import read_card
record = read_card(rel)["metadata"]["psnr_overall"]
def get(p, *ks):
    # Whole-file JSON first (eval artifacts are pretty-printed docs, where
    # "last {-line" grabs a bare opener); fall back to the LAST JSON line
    # for bench artifacts that carry log preamble.
    try:
        text = open(p).read()
        try:
            v = json.loads(text)
        except ValueError:
            line = [l for l in text.splitlines()
                    if l.strip().startswith("{")][-1]
            v = json.loads(line)
        for k in ks: v = v[k]
        return v
    except Exception:
        return None
psnr = get(f"{wd}/eval_256_lstmint8.json", "model", "psnr_overall")
fpsq = get("runs/bench_r4_lstmint8.json", "value")
fpsc = get("runs/bench_r4_control3.json", "value")
ok_q = bool(psnr and psnr >= record - 0.05)
ok_f = bool(fpsq and fpsc and fpsq > fpsc * 1.01)
verdict = dict(mode="conv_int8_lstm", psnr=psnr, record=record,
               record_source=rel, budget=0.05, fps_lstm_int8=fpsq,
               fps_control_same_session=fpsc,
               quality_holds=ok_q, fps_gains=ok_f, flip=ok_q and ok_f)
json.dump(verdict, open(f"{wd}/LSTM_INT8_VERDICT.json", "w"), indent=1)
print("lstm-int8 verdict:", verdict)
if verdict["flip"]:
    json.dump({"overrides": {"model.conv_int8_lstm": True},
               "reason": (f"int8 LSTM gate conv holds the budget: "
                          f"{psnr:.4f} dB vs record {record:.4f} from {rel} "
                          f"(budget 0.05) and gains fps {fpsc:.2f}->"
                          f"{fpsq:.2f} same-session - "
                          f"runs/r4_lstm_int8/LSTM_INT8_VERDICT.json")},
              open("runs/BENCH_OVERRIDES.json", "w"), indent=1)
    print("BENCH_OVERRIDES.json written: int8 LSTM gate conv default")
PYEOF

echo "=== r4_lstm_int8 done $(date -u)" >> "$QUEUE_LOG"
