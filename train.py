#!/usr/bin/env python
"""Train a bin_tpu model (thin wrapper over the bin-tpu-train console script).

Examples:
  python train.py --preset config1_backbone_128 --steps 200
  python train.py --preset config5_v5e_streaming --set data.batch_size=16
"""

from bin_tpu.cli import train_main

if __name__ == "__main__":
    train_main()
