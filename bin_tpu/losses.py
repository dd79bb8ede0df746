"""Training losses: multi-frame Charbonnier, cycle consistency, perceptual.

Reference (SURVEY.md §3.2 'Loss module' [P], BASELINE.json:5): a weighted sum
of per-output Charbonnier/L1 terms over every supervised pyramid output and
time step, a cycle-consistency term between same-timestamp outputs of
different levels, and (extended config) a perceptual term.

Perceptual term: the reference uses VGG features.  ``perceptual_mode="vgg"``
uses the VGG-16 extractor in bin_tpu/perceptual.py (torchvision weight
import, or fixed-seed random filters offline); the default
``perceptual_mode="gradient"`` is a weight-free gradient-domain surrogate.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from bin_tpu.config import LossConfig

__all__ = ["charbonnier", "gradient_loss", "pyramid_loss",
           "build_perceptual_fn"]


def build_perceptual_fn(cfg: LossConfig) -> Callable | None:
    """Resolve the configured perceptual distance, or None when disabled.

    Returns a (pred_rgb, target_rgb) -> scalar callable; RGB in [0, 1],
    unpacked domain.  VGG params load once here and ride into the jitted
    loss as constants.
    """
    if cfg.perceptual_weight <= 0.0:
        return None
    if cfg.perceptual_mode == "gradient":
        return lambda p, t: gradient_loss(p, t, cfg.charbonnier_eps)
    if cfg.perceptual_mode == "vgg":
        from bin_tpu.perceptual import (LAYER_TAPS, init_vgg16_params,
                                        load_vgg16_params, make_perceptual_fn)
        deepest = max(LAYER_TAPS[n] for n in cfg.vgg_layers)
        params = (load_vgg16_params(cfg.vgg_weights, num_convs=deepest + 1)
                  if cfg.vgg_weights
                  else init_vgg16_params(seed=0, num_convs=deepest + 1))
        return make_perceptual_fn(params, cfg.vgg_layers)
    raise ValueError(f"unknown perceptual_mode {cfg.perceptual_mode!r}")


def charbonnier(pred: jax.Array, target: jax.Array, eps: float = 1e-6) -> jax.Array:
    """Mean Charbonnier penalty sqrt(diff^2 + eps^2) — the reference's robust
    L1.  Inputs any shape; returns a scalar. Computed in fp32."""
    diff = pred.astype(jnp.float32) - target.astype(jnp.float32)
    return jnp.mean(jnp.sqrt(diff * diff + eps * eps))


def _spatial_grads(x: jax.Array) -> tuple[jax.Array, jax.Array]:
    return x[..., 1:, :, :] - x[..., :-1, :, :], x[..., :, 1:, :] - x[..., :, :-1, :]


def gradient_loss(pred: jax.Array, target: jax.Array, eps: float = 1e-6) -> jax.Array:
    """Charbonnier on spatial gradients — weight-free perceptual surrogate."""
    pgy, pgx = _spatial_grads(pred)
    tgy, tgx = _spatial_grads(target)
    return charbonnier(pgy, tgy, eps) + charbonnier(pgx, tgx, eps)


def pyramid_loss(outputs: list[jax.Array], gt: jax.Array,
                 cfg: LossConfig, window_size: int,
                 stem_factor: int = 1,
                 perceptual_fn: Callable | None = None
                 ) -> tuple[jax.Array, dict]:
    """Deep-supervised loss for one window step.

    outputs: per-level lists from BINPyramid — level l entry shaped
             (B, window_size-1-l, h, w, C) at times l, l+2, ...
    gt:      (B, 2*window_size-1, h, w, C) sharp frames on the window's
             2x-rate output grid, in the SAME (packed or unpacked) domain
             as the outputs.
    perceptual_fn: from build_perceptual_fn; defaults to the gradient
             surrogate when perceptual_weight > 0 and none is given.

    Charbonnier and cycle terms are pointwise — identical in packed domain.
    Perceptual terms are spatial, so with ``stem_factor > 1`` the operands
    are unpacked first (only when perceptual_weight > 0).
    """
    from bin_tpu.models.pyramid import level_output_times
    from bin_tpu.ops.pixel_shuffle import depth_to_space

    total = jnp.float32(0.0)
    aux: dict[str, jax.Array] = {}
    center_preds = []  # same-timestamp predictions for the cycle term
    # Cycle timestamp: level l only emits times of parity l, so the tied
    # pair must share parity — use the middle timestamp of the DEEPEST
    # odd-parity level (level 3's lone t=3 for K=4, the reference's I3/I3'
    # constraint [P]); window_size-1 alone would silently disable the term
    # for odd window sizes.
    odd_levels = [li + 1 for li in range(len(outputs)) if (li + 1) % 2 == 1]
    center_t = None
    if len(odd_levels) >= 2:
        deep_times = level_output_times(odd_levels[-1], window_size)
        center_t = deep_times[len(deep_times) // 2]
    perceptual_sum = jnp.float32(0.0)
    for idx, out in enumerate(outputs):
        level = idx + 1
        times = level_output_times(level, window_size)
        level_gt = gt[:, jnp.asarray(times)]
        weight = cfg.level_weights[idx] if idx < len(cfg.level_weights) else 1.0
        term = charbonnier(out, level_gt, cfg.charbonnier_eps)
        if cfg.perceptual_weight > 0.0:
            fn = perceptual_fn or (
                lambda p, t: gradient_loss(p, t, cfg.charbonnier_eps))
            p_term = fn(
                depth_to_space(out.astype(jnp.float32), stem_factor),
                depth_to_space(level_gt.astype(jnp.float32), stem_factor))
            perceptual_sum = perceptual_sum + p_term
            term = term + cfg.perceptual_weight * p_term
        aux[f"loss_level{level}"] = term
        total = total + weight * term
        if center_t is not None and center_t in times:
            center_preds.append(out[:, times.index(center_t)])

    if cfg.perceptual_weight > 0.0:
        # unweighted sum over levels — observable in the metrics stream
        # (it is otherwise folded invisibly into loss_level{l})
        aux["loss_perceptual"] = perceptual_sum

    if cfg.cycle_weight > 0.0 and len(center_preds) >= 2:
        # tie the first (level-1) and last (cycle-level) estimates of the
        # centre frame — the reference's cycle-consistency constraint [P]
        cyc = charbonnier(center_preds[0], center_preds[-1], cfg.charbonnier_eps)
        aux["loss_cycle"] = cyc
        total = total + cfg.cycle_weight * cyc

    aux["loss_total"] = total
    return total, aux
