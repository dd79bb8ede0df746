"""Evaluation: streaming full-clip inference + PSNR/SSIM tables."""

from bin_tpu.evaluation.evaluator import evaluate, evaluate_cli

__all__ = ["evaluate", "evaluate_cli"]
