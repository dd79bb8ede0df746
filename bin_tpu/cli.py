"""Command-line entry points (reference equivalent: main.py argparse + *.sh).

Implemented progressively; each entry point parses ``--preset`` plus dotted
``--set key=value`` overrides (see bin_tpu.config).
"""

from __future__ import annotations

import argparse

from bin_tpu.config import PRESETS, Config, get_config


def _base_parser(description: str) -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=description)
    p.add_argument("--preset", default="config1_backbone_128",
                   choices=sorted(PRESETS), help="named config preset")
    p.add_argument("--set", dest="overrides", action="append", default=[],
                   metavar="KEY=VALUE", help="dotted config override, repeatable")
    return p


def parse_config(argv: list[str] | None, description: str,
                 extra_args: dict[str, dict] | None = None):
    p = _base_parser(description)
    for name, kwargs in (extra_args or {}).items():
        p.add_argument(name, **kwargs)
    args = p.parse_args(argv)
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
    })
    evaluate_cli(cfg, checkpoint=args.checkpoint, num_clips=args.num_clips,
                 save_dir=args.save_dir)


def bench_main(argv: list[str] | None = None) -> None:
    from bin_tpu.benchmark import main
    main(argv)


def prep_main(argv: list[str] | None = None) -> None:
    """Offline blur-synthesis over a sharp-frame folder tree (SURVEY.md §4.3)."""
    from bin_tpu.data.blur import prep_cli
    prep_cli(argv)
