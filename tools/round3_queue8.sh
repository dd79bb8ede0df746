#!/bin/bash
# Round-3 phase 10: int8 QAT fine-tune experiment (runs after queue7).
#
# The int8 serving table (BASELINE.md) showed all-conv PTQ = 35.3 fps but
# -0.2 dB; the scoped Cin>=256 default = 32.5 fps at free quality.  A short
# quantization-aware fine-tune (model.conv_int8_qat: fake-quant forward,
# straight-through grads — ops/quant.py) should teach the weights the
# deployment quantization error and make ALL-conv int8 free too:
#   2k steps from the quality-of-record EMA weights at a gentle lr,
#   then pinned-protocol evals of the fine-tuned weights under the
#   all-conv int8 serving graph (what we'd ship) and plain bf16 (drift
#   check).  Success = int8 all-conv PSNR within 0.05 dB of the 28.58
#   record -> next round flips bench.py's default scope to all-conv
#   (~35 fps, vs_baseline ~1.63).
set -u
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR="${JAX_COMPILATION_CACHE_DIR:-/root/repo/.jax_cache}"
LOG=runs/round3_queue8.log
# No phase STARTS after this (default 2026-08-18 09:00 UTC). Ordering with
# queue7: its last arm may START at 07:29 and hold the chip until ~08:30,
# so queue8's start deadline must sit beyond that or the whole experiment
# is silently skipped; 09:00 + the 75-min train bound ends by ~10:15,
# still >2 h before the ~12:26 session end.
DEADLINE="${QUEUE8_DEADLINE:-1787043600}"
echo "=== queue8 start $(date -u) (deadline $(date -u -d @$DEADLINE))" >> "$LOG"
step() { echo "--- $1 rc=$2 $(date -u)" >> "$LOG"; }
guard() { [ "$(date +%s)" -lt "$DEADLINE" ] || { echo "--- $1 SKIPPED (deadline) $(date -u)" >> "$LOG"; return 1; }; }

if [ ! -f runs/prf_qat2k/DONE ]; then
  for attempt in 1 2; do
    guard "train_qat(attempt$attempt)" || break
    timeout 4500 python train.py --preset config3_prf \
      --set model.conv_int8_qat=true --set model.dtype=bfloat16 \
      --set model.remat=true --set data.loader=grain \
      --set optim.learning_rate=2.5e-5 --set optim.lr_decay_steps=100000 \
      --set checkpoint.save_interval_steps=2000 --set checkpoint.keep_last_n=1 \
      --steps 2000 --init-from weights/prf_ema_r3.npz \
      --workdir runs/prf_qat2k >> runs/prf_qat2k.log 2>&1
    rc=$?
    step "train_qat(attempt$attempt)" $rc
    if [ $rc -eq 0 ]; then touch runs/prf_qat2k/DONE; break; fi
    [ $rc -eq 91 ] || [ $rc -eq 124 ] || break
  done
fi

ev() { local out="$1"; shift
  [ -s "$out" ] && return
  guard "$(basename $out)" || return 0
  timeout 1800 python eval.py --preset config3_prf \
    --checkpoint runs/prf_qat2k/checkpoints "$@" > "$out" 2>&1
  step "$(basename $out)" $?; }

if [ -d runs/prf_qat2k/checkpoints ]; then
  # what we'd ship: all-conv int8 serving graph on the fine-tuned weights
  ev runs/eval_qat2k_int8all.txt --set model.conv_int8=true
  # drift check: plain bf16 eval of the same weights
  ev runs/eval_qat2k_bf16.txt
  # control at the serving default scope (should also be >= record)
  ev runs/eval_qat2k_int8c256.txt --set model.conv_int8=true \
     --set model.conv_int8_min_cin=256
fi
# Decision: flip the bench serving default to ALL-conv int8 only if the
# fine-tuned weights hold the 0.05 dB budget against the quality-of-record
# (EMA 28.58 dB pinned 256c, BASELINE.md) UNDER the int8-all serving graph.
# bench.py picks the override file up automatically with provenance.
if [ -s runs/eval_qat2k_int8all.txt ]; then
  python - <<'PYEOF' >> "$LOG" 2>&1
import json, re
def overall(path):
    txt = open(path).read()
    m = re.findall(r"psnr_overall: ([0-9.]+)", txt)
    return float(m[-1]) if m else None
int8 = overall("runs/eval_qat2k_int8all.txt")
bf16 = overall("runs/eval_qat2k_bf16.txt") if __import__("os").path.exists("runs/eval_qat2k_bf16.txt") else None
RECORD = 28.58  # EMA quality-of-record, pinned 256^2 (BASELINE.md round 3)
verdict = dict(int8all_psnr=int8, bf16_psnr=bf16, record=RECORD,
               budget=0.05, flip=bool(int8 and int8 >= RECORD - 0.05))
open("runs/QAT_VERDICT.json", "w").write(json.dumps(verdict))
print("QAT verdict:", verdict)
if verdict["flip"]:
    json.dump({"overrides": {"model.conv_int8_min_cin": 0},
               "reason": f"int8-QAT fine-tune holds the budget: all-conv "
                         f"int8 eval {int8:.4f} dB vs record {RECORD} "
                         f"(budget 0.05) - runs/QAT_VERDICT.json"},
              open("runs/BENCH_OVERRIDES.json", "w"))
    print("BENCH_OVERRIDES.json written: all-conv int8 serving default")
PYEOF
  # export the fine-tuned weights either way (next session's analysis)
  if [ ! -s weights/prf_qat_r3.npz ] && [ "$(date +%s)" -lt "$DEADLINE" ]; then
    timeout 900 python -c "
from bin_tpu.cli import export_main
export_main(['--preset','config3_prf','--checkpoint','runs/prf_qat2k/checkpoints','--out','weights/prf_qat_r3.npz'])" >> "$LOG" 2>&1
    echo "--- export_qat rc=$? $(date -u)" >> "$LOG"
  fi
fi
echo "=== queue8 end $(date -u)" >> "$LOG"
