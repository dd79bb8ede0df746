"""PRF temporal recurrence: sliding-window scan over long clips.

Reference (SURVEY.md §3.2 'Inter-pyramid recurrence', §6.7): the pyramid is
slid along the clip one key frame at a time; the per-level ConvLSTM (h, c)
states are the only thing crossing window boundaries, giving O(1) memory in
clip length.  TPU-native mapping (BASELINE.json:5): ``jax.lax.scan`` over
window start indices with the state pytree as the donated carry; each scan
step slices its window out of the on-device clip with a static-size
``dynamic_slice`` (no host round trips, one compiled step reused T times).

Window timestamp bookkeeping (2x output grid): window s covers keys
s..s+K-1, i.e. output times 2s..2s+2(K-1); pyramid level l predicts local
times l, l+2, ..., 2(K-1)-l (see pyramid.py).
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np

from bin_tpu.config import LossConfig, ModelConfig
from bin_tpu.models.pyramid import level_output_times, total_levels

__all__ = ["num_windows", "scan_windows", "clip_loss", "assembly_plan",
           "assemble_clip", "covered_times"]


def num_windows(num_keys: int, window_size: int) -> int:
    n = num_keys - window_size + 1
    if n < 1:
        raise ValueError(f"clip of {num_keys} keys shorter than window {window_size}")
    return n


def scan_windows(apply_fn: Callable, params: Any, blurry: jax.Array,
                 init_states: list, window_size: int, stem_factor: int = 1,
                 compute_dtype: Any = None, pack_fn: Callable | None = None):
    """Run the pyramid over every sliding window of a clip.

    apply_fn(params, window, states) -> (outputs, new_states)
    blurry: (B, K_total, H, W, 3)

    The clip is packed (space-to-depth) ONCE here, outside the scan, so the
    scan body slices packed frames and no full-resolution layout change
    appears inside the loop.

    Returns (stacked_outputs, final_states): stacked_outputs is a list over
    levels, entry l shaped (S, B, P_l, H/f, W/f, 3f^2) PACKED, with S =
    number of windows (unpack via assemble_clip / depth_to_space).
    """
    from bin_tpu.ops.pixel_shuffle import space_to_depth

    n = num_windows(blurry.shape[1], window_size)
    if compute_dtype is not None:
        # cast-then-pack: bf16 transposes are ~10x cheaper than fp32, and
        # the backbone casts its inputs to the compute dtype regardless
        blurry = blurry.astype(compute_dtype)
    blurry = (pack_fn or space_to_depth)(blurry, stem_factor)

    def body(states, start):
        window = jax.lax.dynamic_slice_in_dim(blurry, start, window_size, axis=1)
        outputs, new_states = apply_fn(params, window, states)
        return new_states, outputs

    starts = jnp.arange(n)
    final_states, outputs = jax.lax.scan(body, init_states, starts)
    return outputs, final_states


def clip_loss(apply_fn: Callable, params: Any, blurry: jax.Array,
              sharp: jax.Array, init_states: list, model_cfg: ModelConfig,
              loss_cfg: LossConfig, perceptual_fn: Callable | None = None):
    """Mean deep-supervised loss over all windows of a clip.

    The loss is accumulated INSIDE the scan (constant memory in clip length
    apart from what autodiff saves per step; pair with jax.checkpoint on
    apply_fn for long clips).
    """
    from bin_tpu.losses import pyramid_loss
    from bin_tpu.ops.pixel_shuffle import input_pack_fn, space_to_depth

    k = model_cfg.window_size
    n = num_windows(blurry.shape[1], k)
    gt_span = 2 * k - 1
    # Pack inputs AND ground truth once, outside the scan: the Charbonnier
    # terms are pointwise, so supervising packed outputs against packed GT
    # is numerically identical to full-resolution supervision.  The input
    # is cast to the compute dtype BEFORE packing (cheap bf16 transpose);
    # the GT stays fp32 — the loss accumulates in fp32.
    f = model_cfg.stem_factor
    pack = input_pack_fn(model_cfg)
    blurry = pack(blurry.astype(jnp.dtype(model_cfg.dtype)), f)
    sharp = pack(sharp, f)

    if model_cfg.remat:
        # Recompute each window's activations during backward: training
        # memory stays O(window) instead of O(clip) at ~1.3x FLOPs.
        apply_fn = jax.checkpoint(apply_fn, static_argnums=())

    def body(states, start):
        window = jax.lax.dynamic_slice_in_dim(blurry, start, k, axis=1)
        gt = jax.lax.dynamic_slice_in_dim(sharp, 2 * start, gt_span, axis=1)
        outputs, new_states = apply_fn(params, window, states)
        loss, aux = pyramid_loss(outputs, gt, loss_cfg, k, stem_factor=f,
                                 perceptual_fn=perceptual_fn)
        return new_states, (loss, aux)

    starts = jnp.arange(n)
    _, (losses, auxs) = jax.lax.scan(body, init_states, starts)
    mean_aux = {k_: jnp.mean(v) for k_, v in auxs.items()}
    return jnp.mean(losses), mean_aux


def assembly_plan(num_keys: int, window_size: int,
                  levels: int) -> dict[int, tuple[int, int, int]]:
    """Static plan: output time t -> (level_idx, window, pair_index).

    For every reachable output timestamp, pick the DEEPEST pyramid level
    whose parity matches t, then the window placing t most centrally in that
    level (ties → later window, i.e. more ConvLSTM history).  Boundary times
    0 and 2*(num_keys-1) are never predicted — the reference likewise
    excludes clip-boundary frames from its tables (SURVEY.md §4.2).
    """
    s_count = num_windows(num_keys, window_size)
    plan: dict[int, tuple[int, int, int]] = {}
    for t in range(1, 2 * (num_keys - 1)):
        for li in range(levels - 1, -1, -1):
            level = li + 1
            if (t - level) % 2:
                continue
            p = window_size - 1 - li
            best = None
            for s in range(s_count):
                j = (t - 2 * s - level) // 2
                if 0 <= j < p:
                    key = (abs(j - (p - 1) / 2), -s)
                    if best is None or key < best[0]:
                        best = (key, s, j)
            if best is not None:
                plan[t] = (li, best[1], best[2])
                break
    return plan


def covered_times(num_keys: int, window_size: int, levels: int) -> list[int]:
    return sorted(assembly_plan(num_keys, window_size, levels))


def assemble_clip(stacked_outputs: list[jax.Array], num_keys: int,
                  window_size: int, stem_factor: int = 1,
                  via_conv: bool = False) -> tuple[jax.Array, np.ndarray]:
    """Assemble the 2x-rate sharp video from scanned pyramid outputs.

    stacked_outputs: per level, PACKED (S, B, P_l, h, w, 3f^2) as from
    scan_windows.  The single depth-to-space back to full resolution (and
    the cast to fp32) happens here, on the assembled video only.

    via_conv: unpack with the one-hot transposed conv instead of the
    reshape/moveaxis form (bit-exact — the round-5 trace pinned the
    reshape form's transpose as the single largest non-conv op pool,
    copy.382+copy.381 at 18-21 GB/s).  The conv runs in the compute dtype
    and the fp32 cast follows: a permutation commutes bit-exactly with
    the pointwise convert, and the half-width bf16 tensor halves the
    bytes the layout move touches.

    Returns (video, times): video (B, T_cov, H, W, 3) fp32 and the global
    output timestamps (ascending) each frame corresponds to.
    """
    from bin_tpu.ops.pixel_shuffle import depth_to_space, depth_to_space_conv

    levels = len(stacked_outputs)
    plan = assembly_plan(num_keys, window_size, levels)
    times = sorted(plan)
    frames = [stacked_outputs[plan[t][0]][plan[t][1], :, plan[t][2]] for t in times]
    video = jnp.stack(frames, axis=1)
    if via_conv:
        video = depth_to_space_conv(video, stem_factor).astype(jnp.float32)
    else:
        video = depth_to_space(video.astype(jnp.float32), stem_factor)
    return video, np.asarray(times)
