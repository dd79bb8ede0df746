#!/usr/bin/env python
"""Calibrate STATIC int8 activation scales for serving (ops/quant.py).

The dynamic per-activation abs-max reduce is ~8-11% of the estimated serving
step (round-5 HLO cost pool quant.py:64): every quantized conv reads its
input from HBM once for the max and again for the quantize, and the
quantize serializes behind the reduction.  A static calibrated scale makes
the quantize pure elementwise (it fuses into the producer) at the cost of
saturating activations that exceed the calibrated range — a quality trade
the pinned-protocol eval gates like every int8 knob (BASELINE.md).

Method: run the model in ``model.conv_int8_calibrate=true`` mode (plain
float convs; every would-be-quantized conv sows its input abs-max into the
mutable ``quant_stats`` collection, max-reduced) over N protocol-generator
clips with the real sliding-window recurrence (the ConvLSTM hidden-state
scale needs warmed-up carries), take the max across all windows and clips,
and write {conv path -> amax * margin / 127} as an .npz consumed via
``model.conv_int8_static=<path>``.

NB the scales are loaded as trace-time constants (lru-cached per path,
ops/quant.py load_act_scales) — serve from a fresh process after
re-calibrating.

Usage: python tools/calibrate_int8.py --checkpoint weights/prf_ema_r4.npz \
          --out weights/prf_ema_r4.scales.npz [--clips 8] [--margin 1.0]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", required=True,
                    help="release .npz or checkpoint dir")
    ap.add_argument("--preset", default="config3_prf")
    ap.add_argument("--out", required=True, help="output scales .npz")
    ap.add_argument("--size", type=int, nargs="+", default=[256],
                    help="calibration clip size (H [W])")
    ap.add_argument("--keys", type=int, default=12)
    ap.add_argument("--clips", type=int, default=8)
    ap.add_argument("--seed", type=int, default=1234,
                    help="calibration seed — deliberately NOT the pinned "
                         "eval seed 9999, so the gate evaluates on data "
                         "the calibration never saw")
    ap.add_argument("--margin", type=float, default=1.0,
                    help="scale safety factor on the observed abs-max "
                         "(>1 = headroom against unseen outliers at the "
                         "cost of a coarser grid)")
    ap.add_argument("--ema", action="store_true")
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import numpy as np

    from bin_tpu.config import get_config
    from bin_tpu.data.pipeline import SyntheticSource
    from bin_tpu.registry import build_model
    from bin_tpu.training.checkpoint import restore_params

    h = args.size[0]
    w = args.size[1] if len(args.size) > 1 else args.size[0]
    cfg = get_config(args.preset, ["model.conv_int8_calibrate=true",
                                   "model.dtype=bfloat16"])
    model = build_model(cfg)
    params = restore_params(args.checkpoint, ema=args.ema)
    source = SyntheticSource(num_samples=args.clips, num_keys=args.keys,
                             height=h, width=w, seed=args.seed,
                             style=cfg.data.synthetic_style)

    import jax.numpy as jnp

    @jax.jit
    def step(p, window, states):
        (outs, new_states), upd = model.module.apply(
            {"params": p}, window, states, producer_clamp=True,
            mutable=["quant_stats"])
        return new_states, upd["quant_stats"]

    merged = None
    k = cfg.model.window_size
    for i in range(len(source)):
        clip = jnp.asarray(source[i]["blurry"][None])  # (1, K, H, W, 3)
        states = model.initial_state(1, h, w)
        for s in range(clip.shape[1] - k + 1):
            states, stats = step(params, clip[:, s:s + k], states)
            merged = stats if merged is None else jax.tree.map(
                jnp.maximum, merged, stats)
        print(f"clip {i + 1}/{len(source)} done", file=sys.stderr)

    flat = jax.tree_util.tree_flatten_with_path(merged)[0]
    scales = {}
    for path, amax in flat:
        parts = [p.key for p in path]
        assert parts[-1].endswith("_amax"), parts
        key = "/".join(parts[:-1] + [parts[-1][: -len("_amax")]])
        scales[key] = np.float32(
            max(float(amax), 1e-8) * args.margin / 127.0)
    # provenance: scales encode THIS checkpoint's activation ranges; the
    # consumers (benchmark.load_auto_overrides) refuse to pair the sidecar
    # with different weights
    np.savez(args.out,
             __calibrated_for__=np.str_(os.path.basename(
                 str(args.checkpoint).rstrip("/"))),
             **scales)
    print(f"wrote {args.out}: {len(scales)} conv activation scales "
          f"(margin {args.margin}, {args.clips} clips @ {h}x{w} "
          f"seed {args.seed})")
    for key in sorted(scales)[:80]:
        print(f"  {key}: {scales[key]:.6f}")


if __name__ == "__main__":
    main()
