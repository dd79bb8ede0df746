#!/bin/bash
# Round-5 final-unpack A/B: the new default runs assemble_clip's closing
# depth-to-space as a one-hot transposed conv (commit be74a49 — attacks the
# copy.382+copy.381 pool, 2.27 ms/window at 18-21 GB/s in
# runs/trace_r5_default.txt).  The ARM pins the OLD reshape form, so
# control(same session, new default) vs arm(old) is the measured claim.
# A "flip" verdict here would mean the reshape form is still faster and the
# code default must be reverted.
set -u
cd "$(dirname "$0")/.."

while [ -f /tmp/r5_serving2.pid ] && kill -0 "$(cat /tmp/r5_serving2.pid)" 2>/dev/null; do
  sleep 60
done

bash tools/run_experiment.sh r5_final_unpack --no-eval \
  model.d2s_final_via_conv=false
echo "=== r5_final_unpack done $(date -u)" >> runs/r5_chain.log
