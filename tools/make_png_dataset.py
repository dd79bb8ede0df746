#!/usr/bin/env python
"""Render a realistic PNG dataset tree: textured synthetic 240fps sharp
frames at 1280x720, in the raw layout ``bin-tpu-prep`` consumes
(<root>/<clip_id>/NNNNNN.png).

This is the stand-in for downloading Adobe240/GoPro on a zero-egress host
(VERDICT r1 item 4): it rehearses the REAL data path — PNG decode, prep,
640x352 resize protocol, full-sequence 720p eval — end to end.

Usage: python tools/make_png_dataset.py OUT_DIR [--clips 3] [--keys 12]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from PIL import Image

from bin_tpu.data.synthetic import num_sharp_needed, render_sharp_clip


def main():
    p = argparse.ArgumentParser()
    p.add_argument("out")
    p.add_argument("--clips", type=int, default=3)
    p.add_argument("--keys", type=int, default=12,
                   help="blurry keys each clip should yield after prep")
    p.add_argument("--height", type=int, default=720)
    p.add_argument("--width", type=int, default=1280)
    p.add_argument("--taps", type=int, default=11)
    p.add_argument("--stride", type=int, default=8)
    p.add_argument("--seed", type=int, default=2024)
    args = p.parse_args()

    frames_per_clip = num_sharp_needed(args.keys, args.taps, args.stride)
    for ci in range(args.clips):
        d = os.path.join(args.out, f"clip{ci:03d}")
        os.makedirs(d, exist_ok=True)
        t0 = time.monotonic()
        clip = render_sharp_clip(args.seed + ci, frames_per_clip,
                                 args.height, args.width, style="textured")
        for t in range(frames_per_clip):
            arr = (clip[t] * 255.0 + 0.5).astype(np.uint8)
            Image.fromarray(arr).save(os.path.join(d, f"{t:06d}.png"))
        print(f"clip{ci:03d}: {frames_per_clip} frames "
              f"({time.monotonic() - t0:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
