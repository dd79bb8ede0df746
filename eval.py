#!/usr/bin/env python
"""Evaluate PSNR/SSIM of a bin_tpu model (wrapper over bin-tpu-eval).

Examples:
  python eval.py --preset config2_pyramid --checkpoint runs/latest/checkpoints
"""

from bin_tpu.cli import eval_main

if __name__ == "__main__":
    eval_main()
