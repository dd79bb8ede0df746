"""Command-line entry points (reference equivalent: main.py argparse + *.sh).

Implemented progressively; each entry point parses ``--preset`` plus dotted
``--set key=value`` overrides (see bin_tpu.config).
"""

from __future__ import annotations

import argparse
import os

from bin_tpu.config import PRESETS, Config, get_config


def _apply_platform(platform: str | None) -> None:
    """Force a JAX backend IN-PROCESS, before any device touch.

    This environment ignores the ``JAX_PLATFORMS`` shell env var (observed:
    exporting it has no effect; `bin_tpu/benchmark.py:wait_for_device` hit
    the same trap), so a CPU-only drive of the CLIs would otherwise grab the
    real TPU tunnel — which can wedge for >10 min when the axon backend is
    down.  ``--platform cpu`` (or env ``BIN_TPU_PLATFORM=cpu``) is the
    supported way to keep a CLI run off the chip.
    """
    platform = platform or os.environ.get("BIN_TPU_PLATFORM")
    if platform:
        import jax
        jax.config.update("jax_platforms", platform)


def _base_parser(description: str) -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=description)
    p.add_argument("--preset", default="config1_backbone_128",
                   choices=sorted(PRESETS), help="named config preset")
    p.add_argument("--set", dest="overrides", action="append", default=[],
                   metavar="KEY=VALUE", help="dotted config override, repeatable")
    p.add_argument("--platform", default=None, metavar="BACKEND",
                   help="force the JAX backend in-process (e.g. cpu) — the "
                        "JAX_PLATFORMS env var is ignored on this host; "
                        "env fallback: BIN_TPU_PLATFORM")
    return p


def parse_config(argv: list[str] | None, description: str,
                 extra_args: dict[str, dict] | None = None):
    p = _base_parser(description)
    for name, kwargs in (extra_args or {}).items():
        p.add_argument(name, **kwargs)
    args = p.parse_args(argv)
    _apply_platform(args.platform)
    cfg = get_config(args.preset, args.overrides)
    return cfg, args


def train_main(argv: list[str] | None = None) -> None:
    from bin_tpu.training.trainer import train
    cfg, args = parse_config(argv, "Train a bin_tpu model.", {
        "--steps": dict(type=int, default=None, help="override optim.num_steps"),
        "--workdir": dict(default="runs/latest", help="checkpoints + logs dir"),
        "--init-from": dict(default="", help="warm-start params from this "
                                             "checkpoint dir (fresh optimizer)"),
    })
    train(cfg, workdir=args.workdir, num_steps=args.steps,
          init_params_from=args.init_from)


def eval_main(argv: list[str] | None = None) -> None:
    from bin_tpu.evaluation.evaluator import evaluate_cli
    cfg, args = parse_config(argv, "Evaluate PSNR/SSIM of a bin_tpu model.", {
        "--checkpoint": dict(default="", help="checkpoint dir (empty = random init)"),
        "--num-clips": dict(type=int, default=None,
                            help="eval clips (default: the preset's pinned "
                                 "eval protocol, data.eval_num_clips)"),
        "--save-dir": dict(default="", help="write output frames as PNGs here"),
        "--ema": dict(action="store_true",
                      help="evaluate the EMA params (optim.ema_decay runs)"),
        "--self-ensemble": dict(action="store_true",
                                help="test-time augmentation: average the 4 "
                                     "spatial-flip predictions (4x compute; "
                                     "NOT protocol-comparable with plain "
                                     "evals)"),
    })
    evaluate_cli(cfg, checkpoint=args.checkpoint, num_clips=args.num_clips,
                 save_dir=args.save_dir, ema=args.ema,
                 self_ensemble=args.self_ensemble)


def bench_main(argv: list[str] | None = None) -> None:
    from bin_tpu.benchmark import main
    main(argv)


def prep_main(argv: list[str] | None = None) -> None:
    """Offline blur-synthesis over a sharp-frame folder tree (SURVEY.md §4.3)."""
    from bin_tpu.data.blur import prep_cli
    prep_cli(argv)


def export_main(argv: list[str] | None = None) -> None:
    """Export a training checkpoint as a portable released-weights file
    (the reference's pretrained state_dict equivalent, SURVEY.md §3.2)."""
    from bin_tpu.training.checkpoint import restore_params
    from bin_tpu.weights import export_weights

    cfg, args = parse_config(argv, "Export released weights from a checkpoint.", {
        "--checkpoint": dict(required=True, help="checkpoint directory"),
        "--out": dict(required=True, help="output .npz weights file"),
        "--note": dict(default="", help="free-form metadata note"),
        "--ema": dict(action="store_true",
                      help="export the EMA params (optim.ema_decay runs)"),
        "--store-dtype": dict(default=None, metavar="DTYPE",
                              help="storage dtype for float leaves (e.g. "
                                   "float16 halves the file; load_weights "
                                   "upcasts back to float32)"),
        "--eval-json": dict(action="append", default=[], metavar="PATH",
                            help="eval record(s) from tools/quality_eval.py "
                                 "--json-out, folded into the model card; the "
                                 "FIRST one is the headline (sets metadata."
                                 "psnr_overall / ssim_overall / eval_protocol)"
                                 " — quality provenance the release guard "
                                 "test enforces (VERDICT r3)"),
    })
    import json

    params = restore_params(args.checkpoint, ema=args.ema)
    metadata = {"preset": cfg.preset, "note": args.note,
                **({"ema": True} if args.ema else {})}
    evals = [json.load(open(p)) for p in args.eval_json]
    if evals:
        head = evals[0]
        metadata.update(
            psnr_overall=head["model"]["psnr_overall"],
            ssim_overall=head["model"]["ssim_overall"],
            eval_protocol=head["protocol"], evals=evals)
    export_weights(args.out, params, cfg.model, metadata=metadata,
                   store_dtype=args.store_dtype)
    print(f"wrote {args.out}"
          + (f" (psnr_overall {metadata['psnr_overall']:.4f} dB under "
             f"{metadata['eval_protocol']})" if evals else ""))


def demo_main(argv: list[str] | None = None) -> None:
    """Demo: consume a released weights file, run joint deblur + 2x interp
    on a blurry frame folder (or a synthetic clip), write output PNGs —
    the reference's demo.py flow (SURVEY.md §4.2)."""
    import argparse

    import jax
    import numpy as np

    from bin_tpu.data.video import VIDEO_EXTS

    p = argparse.ArgumentParser(description=demo_main.__doc__)
    p.add_argument("--weights", required=True, help=".npz from bin-tpu-export")
    p.add_argument("--input", default="synthetic",
                   help="folder of blurry key-frame images, a blurry video "
                        "file (decoded via bin_tpu.data.video), or "
                        "'synthetic'")
    p.add_argument("--out", default="demo_out", help="output PNG folder")
    p.add_argument("--size", type=int, nargs=2, default=(256, 256),
                   metavar=("H", "W"), help="synthetic input size")
    p.add_argument("--keys", type=int, default=10, help="synthetic clip keys")
    p.add_argument("--platform", default=None, metavar="BACKEND",
                   help="force the JAX backend in-process (e.g. cpu)")
    args = p.parse_args(argv)
    _apply_platform(args.platform)

    from bin_tpu.evaluation.evaluator import save_clip_frames
    from bin_tpu.registry import build_model
    from bin_tpu.weights import load_weights

    params, model_cfg, meta = load_weights(args.weights)
    model = build_model(model_cfg)
    print(f"loaded {args.weights}: preset={meta.get('preset', '?')} "
          f"model={model_cfg.name}")

    def _validate_and_stack(frames: list, what: str) -> np.ndarray:
        """Shared clip validation: count, consistent sizes, and conv-scale
        divisibility (stem space-to-depth x the encoder's 2x downsamples)."""
        if len(frames) < model_cfg.window_size:
            raise SystemExit(f"need >= {model_cfg.window_size} frames, "
                             f"got {len(frames)} from {what}")
        shapes = {f.shape for f in frames}
        if len(shapes) != 1:
            raise SystemExit(
                f"input frames of {what} have differing sizes: "
                + ", ".join(sorted(f"{s[0]}x{s[1]}" for s in shapes))
                + " — resize them to a common resolution first")
        h, w = frames[0].shape[:2]
        div = model_cfg.stem_factor * 2 ** (len(model_cfg.channel_mult) - 1)
        if h % div or w % div:
            raise SystemExit(
                f"frame size {h}x{w} not divisible by {div} "
                f"(stem_factor {model_cfg.stem_factor} x "
                f"{2 ** (len(model_cfg.channel_mult) - 1)} encoder downsample)"
                f" — crop/resize to multiples of {div}, e.g. "
                f"{h - h % div}x{w - w % div}")
        return np.stack(frames)[None]

    if args.input == "synthetic":
        from bin_tpu.data.synthetic import make_sample
        h, w = args.size
        sample = make_sample(seed=7, num_keys=args.keys, height=h, width=w,
                             style="textured")
        blurry = sample["blurry"][None]
    elif args.input.lower().endswith(VIDEO_EXTS):
        # a blurry VIDEO file: decode key frames directly (data/video.py)
        from bin_tpu.data.video import iter_video_frames
        blurry = _validate_and_stack(
            [f.astype(np.float32) / 255.0 for f in iter_video_frames(args.input)],
            args.input)
    else:
        from bin_tpu.data.frames import load_frame
        import os
        paths = sorted(os.path.join(args.input, f)
                       for f in os.listdir(args.input)
                       if f.lower().endswith((".png", ".jpg", ".npy")))
        blurry = _validate_and_stack([load_frame(f) for f in paths],
                                     args.input)

    video, times = jax.jit(model.infer_clip)(params, blurry)
    save_clip_frames(np.asarray(video[0]), times, args.out, "demo")
    print(f"wrote {video.shape[1]} sharp frames (2x rate, times "
          f"{int(times[0])}..{int(times[-1])}) under {args.out}/demo/")
