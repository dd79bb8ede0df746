#!/usr/bin/env python
"""Quality evaluation of a trained checkpoint vs the no-learning baselines.

Baselines per output timestamp:
  even t (deblur):  the blurry input key frame itself
  odd t (interp):   the average of the two neighboring blurry keys
(the second is exactly what the zero-init model predicts, so the delta is
pure learned improvement).

Usage: python tools/quality_eval.py --checkpoint runs/prf_synth/checkpoints \
          [--preset config3_prf] [--size 256] [--keys 8] [--clips 4]
"""

import argparse
import json

import jax
import jax.numpy as jnp
import numpy as np

import os
import sys

# tools/ scripts must run without the editable install (a VM reset wipes
# site-packages): put the repo root ahead of sys.path[0]=tools/.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bin_tpu.config import get_config
from bin_tpu.data.pipeline import SyntheticSource, eval_clips
from bin_tpu.evaluation.evaluator import clip_metrics_fn, evaluate
from bin_tpu.metrics import psnr, ssim
from bin_tpu.registry import build_model
from bin_tpu.training.checkpoint import restore_params


def baseline_metrics(clip):
    """No-learning baseline on the same covered timestamps (1..2K-3)."""
    blurry, sharp = clip["blurry"], clip["sharp"]
    k = blurry.shape[1]
    rows = {}
    ests, gts, parities = [], [], []
    for t in range(1, 2 * (k - 1)):
        gt = sharp[:, t]
        if t % 2 == 0:
            est = blurry[:, t // 2]
        else:
            est = 0.5 * (blurry[:, t // 2] + blurry[:, t // 2 + 1])
        ests.append(est)
        gts.append(gt)
        parities.append(t % 2)
    est = jnp.asarray(np.stack(ests, 1))
    gt = jnp.asarray(np.stack(gts, 1))
    par = np.asarray(parities)
    p = np.asarray(psnr(est, gt))
    s = np.asarray(ssim(est, gt))
    for name, mask in (("deblur", par == 0), ("interp", par == 1),
                       ("overall", np.ones_like(par, bool))):
        rows[f"psnr_{name}"] = float(p[:, mask].mean())
        rows[f"ssim_{name}"] = float(s[:, mask].mean())
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--preset", default="config3_prf")
    ap.add_argument("--size", type=int, nargs="+", default=[256],
                    help="eval resolution: SIZE (square) or H W — e.g. "
                         "'--size 352 640' for the Adobe240 half-res protocol")
    ap.add_argument("--keys", type=int, default=12)
    ap.add_argument("--clips", type=int, default=16)
    ap.add_argument("--style", default=None,
                    help="synthetic style override (default: preset's)")
    ap.add_argument("--set", dest="overrides", action="append", default=[])
    ap.add_argument("--ema", action="store_true",
                    help="evaluate the EMA params (optim.ema_decay runs)")
    ap.add_argument("--self-ensemble", action="store_true",
                    help="test-time augmentation: average the 4 spatial-flip "
                         "predictions (4x compute).  Recorded in the "
                         "protocol — NOT comparable with plain evals")
    ap.add_argument("--json-out", default="",
                    help="also write a machine-readable eval record here "
                         "(protocol + model + baseline metrics) — the file "
                         "bin-tpu-export --eval-json folds into the released "
                         "model card (quality provenance, VERDICT r3)")
    ap.add_argument("--platform", default=None, metavar="BACKEND",
                    help="force the JAX backend in-process (e.g. cpu); env "
                         "fallback BIN_TPU_PLATFORM — same contract as the "
                         "package CLIs (bin_tpu/cli.py)")
    args = ap.parse_args()
    from bin_tpu.cli import _apply_platform
    _apply_platform(args.platform)

    cfg = get_config(args.preset, args.overrides)
    model = build_model(cfg)
    params = restore_params(args.checkpoint, ema=args.ema)

    h = args.size[0]
    w = args.size[1] if len(args.size) > 1 else args.size[0]
    print(f"eval protocol: size={h}x{w} clips={args.clips} keys={args.keys} "
          f"seed={cfg.data.eval_seed} dtype={cfg.model.dtype}"
          + (" params=ema" if args.ema else "")
          + (" self_ensemble=x4" if args.self_ensemble else ""))
    source = SyntheticSource(num_samples=args.clips, num_keys=args.keys,
                             height=h, width=w,
                             seed=cfg.data.eval_seed,
                             style=args.style or cfg.data.synthetic_style)

    base = {}
    for clip in eval_clips(source, batch_size=1):
        for k_, v in baseline_metrics(clip).items():
            base[k_] = base.get(k_, 0.0) + v / args.clips
    print("== no-learning baseline ==")
    for k_ in sorted(base):
        print(f"  {k_}: {base[k_]:.4f}")

    results = evaluate(model, params, eval_clips(source, batch_size=1),
                       self_ensemble=args.self_ensemble)
    print(json.dumps({"model": results, "baseline": base}, default=float))
    if args.json_out:
        record = {
            "protocol": {"size": [h, w], "clips": args.clips,
                         "keys": args.keys, "seed": cfg.data.eval_seed,
                         "style": args.style or cfg.data.synthetic_style,
                         "dtype": cfg.model.dtype,
                         "params": "ema" if args.ema else "raw",
                         **({"self_ensemble": 4} if args.self_ensemble
                            else {})},
            "preset": args.preset, "overrides": args.overrides,
            "checkpoint": args.checkpoint,
            "model": {k: float(v) for k, v in results.items()},
            "baseline": {k: float(v) for k, v in base.items()},
        }
        with open(args.json_out, "w") as f:
            json.dump(record, f, indent=1)
        print(f"wrote {args.json_out}")


if __name__ == "__main__":
    main()
