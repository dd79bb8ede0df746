#!/usr/bin/env python
"""Tabulate quality_eval outputs across run dirs.

Usage: python tools/compare_runs.py runs/prf_pixel_ctrl runs/prf_grad20k ...
Reads each run's quality_*.txt (the JSON line quality_eval prints last) and
prints a markdown table vs the shared no-learning baseline.
"""

import glob
import json
import os
import sys


def read_quality(path):
    """Last JSON line of a quality_eval output file -> (model, baseline)."""
    with open(path) as f:
        lines = [l.strip() for l in f if l.strip().startswith("{")]
    if not lines:
        return None
    d = json.loads(lines[-1])
    return d.get("model"), d.get("baseline")


def main():
    run_dirs = sys.argv[1:]
    if not run_dirs:
        run_dirs = sorted(d for d in glob.glob("runs/*") if os.path.isdir(d))
    rows = []
    for d in run_dirs:
        for qf in sorted(glob.glob(os.path.join(d, "quality_*.txt"))):
            got = read_quality(qf)
            if not got or not got[0]:
                continue
            tag = f"{os.path.basename(d)}:{os.path.basename(qf)[8:-4]}"
            rows.append((tag, got[0], got[1]))
    if not rows:
        print("no quality_*.txt results found", file=sys.stderr)
        return
    cols = ["psnr_deblur", "psnr_interp", "psnr_overall", "ssim_overall"]
    print("| run | " + " | ".join(c.replace("_", " ") for c in cols)
          + " | (PSNR deltas vs each eval's own no-learning baseline)")
    print("|---|" + "---|" * len(cols))
    for tag, m, base in rows:
        cells = []
        for c in cols:
            v = m.get(c)
            delta = (f" ({v - base[c]:+.2f})"
                     if base and c.startswith("psnr") else "")
            cells.append(f"{v:.4g}{delta}" if v is not None else "—")
        print(f"| {tag} | " + " | ".join(cells) + " |")


if __name__ == "__main__":
    main()
