#!/bin/bash
# End-to-end rehearsal of the REAL-data path (VERDICT r1 item 4): a rendered
# 1280x720 PNG frame tree stands in for Adobe240/GoPro on this zero-egress
# host, and every stage below runs exactly as it would on the real datasets
# (SURVEY.md §4.3 prep flow, §4.2 eval flow):
#
#   1. render   -> data/raw720/<clip>/NNNNNN.png       (240fps sharp frames)
#   2. prep     -> data/gopro720/{blurry,sharp}/<clip> (11-tap / stride-8 blur)
#   3. train    -> short config4_gopro_720p run on the prepped tree
#   4. eval     -> 640x352 resize protocol (Adobe240-style half resolution)
#   5. eval     -> full-sequence 1280x720 (GoPro-style), PNG frame dump
#
# Everything goes through the public CLIs only. Results land in
# runs/gopro_rehearsal/ and are recorded in BASELINE.md.
set -euo pipefail
cd "$(dirname "$0")/.."

RAW=data/raw720
PREPPED=data/gopro720
WORKDIR=runs/gopro_rehearsal
STEPS=${STEPS:-300}

if [ ! -d "$RAW" ]; then
  echo "== rendering PNG tree (3 clips x 115 frames, 1280x720) =="
  python tools/make_png_dataset.py "$RAW" --clips 3 --keys 14
fi

if [ ! -d "$PREPPED" ]; then
  echo "== blur-synthesis prep (PNG decode -> 11-tap mean, stride 8) =="
  python -c "from bin_tpu.cli import prep_main; prep_main()" "$RAW" "$PREPPED"
fi

echo "== short 720p train on the prepped tree =="
python train.py --preset config4_gopro_720p \
  --set data.root="$PREPPED" \
  --set model.dtype=bfloat16 --set model.remat=true \
  --set optim.learning_rate=1e-4 \
  --steps "$STEPS" --workdir "$WORKDIR"

echo "== 640x352 eval (Adobe240 half-resolution resize protocol) =="
python eval.py --preset config4_gopro_720p \
  --set data.root="$PREPPED" --set data.eval_size=352,640 \
  --checkpoint "$WORKDIR/checkpoints" | tee "$WORKDIR/eval_640x352.txt"

echo "== full-sequence 1280x720 eval + PNG dump =="
python eval.py --preset config4_gopro_720p \
  --set data.root="$PREPPED" \
  --checkpoint "$WORKDIR/checkpoints" --save-dir "$WORKDIR/frames" \
  | tee "$WORKDIR/eval_720p.txt"

echo "rehearsal OK — outputs under $WORKDIR/"
