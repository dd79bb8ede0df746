#!/bin/bash
# Pallas ConvLSTM-gate kernel verdict (VERDICT r1 item 8): A/B the flagship
# 720p clip-scan throughput with the fused Pallas gate kernel vs XLA's own
# fusion, at flagship shapes, on the real chip. Records both JSON lines;
# the preset enables the kernel only if it wins >= 3% end-to-end.
set -euo pipefail
cd "$(dirname "$0")/.."
echo "== XLA fusion (baseline) =="
python bench.py "$@"
echo "== Pallas fused gates =="
python bench.py --set model.use_pallas_lstm=true "$@"
