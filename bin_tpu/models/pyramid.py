"""BIN/PRF pyramid assembly over one sliding window of blurry key frames.

Reference wiring (SURVEY.md §4.4 [P], BASELINE.json:7-9) for a 4-key-frame
window B0,B2,B4,B6 (subscripts are output timestamps on the 2x grid):

  level 1: backbone(B0,B2)→I1, backbone(B2,B4)→I3, backbone(B4,B6)→I5
  level 2: backbone(I1,I3)→I2, backbone(I3,I5)→I4      (deblurred keys)
  level 3: backbone(I2,I4)→I3'                          (cycle level)

Every level's outputs are supervised (deep supervision); the cycle-
consistency loss ties I3 (level 1) to I3' (level 3).  In general, level l
emits window_size - l frames at output times l, l+2, ..., 2*(window-1)-l.

PRF recurrence (SURVEY.md §3.2 'Inter-pyramid recurrence'): one ConvLSTM per
level, operating at the backbone bottleneck resolution.  Its hidden state is
injected as bottleneck context into every backbone call of that level and is
updated from the mean of the level's bottleneck features; (h, c) persist
across sliding-window steps (carried by jax.lax.scan in recurrent.py).

TPU-native batching: each level runs its backbone on all adjacent pairs at
once by folding the pair axis into the batch axis — one conv stack at batch
B*(window-l) instead of window-l sequential calls, keeping MXU utilization
high at small per-clip batch sizes.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from bin_tpu.config import ModelConfig
from bin_tpu.models.backbone import Backbone
from bin_tpu.models.convlstm import ConvLSTMCell, init_state

__all__ = ["BINPyramid", "level_output_times", "total_levels", "initial_state"]

State = tuple[jax.Array, jax.Array]


def initial_state(cfg: ModelConfig, batch: int, height: int,
                  width: int) -> list[State]:
    """Zero ConvLSTM carries for a (batch, height, width) clip; [] when
    recurrence is disabled (a static-empty scan carry).  Free function so it
    works without binding the Flax module (it touches no parameters)."""
    if not cfg.use_convlstm:
        return []
    f = cfg.stem_factor * 2 ** (len(cfg.channel_mult) - 1)
    return [
        init_state(batch, height // f, width // f, cfg.convlstm_features)
        for _ in range(total_levels(cfg))
    ]


def total_levels(cfg: ModelConfig) -> int:
    n = cfg.num_levels + (1 if cfg.cycle_level else 0)
    if n > cfg.window_size - 1:
        raise ValueError(
            f"{n} pyramid levels need window_size > {n}, got {cfg.window_size}")
    return n


def level_output_times(level: int, window_size: int) -> list[int]:
    """Output timestamps (2x grid, window-local) of 1-indexed ``level``."""
    return list(range(level, 2 * (window_size - 1) - level + 1, 2))


class BINPyramid(nn.Module):
    """One pyramid forward over a window; all model variants (backbone-only /
    BIN pyramid / PRF) are this module with different config flags."""

    cfg: ModelConfig

    def setup(self):
        c = self.cfg
        dtype = jnp.dtype(c.dtype)
        pdtype = jnp.dtype(c.param_dtype)
        n = total_levels(c)
        scales = None
        if c.conv_int8_static:
            from bin_tpu.ops.quant import load_act_scales
            scales = load_act_scales(c.conv_int8_static)
        self.backbones = [
            Backbone(base_features=c.base_features, channel_mult=c.channel_mult,
                     num_res_blocks=c.num_res_blocks, slope=c.lrelu_slope,
                     stem_factor=c.stem_factor, dtype=dtype,
                     param_dtype=pdtype, fused_upsample=c.fused_upsample,
                     conv_int8=c.conv_int8,
                     conv_int8_min_cin=c.conv_int8_min_cin,
                     conv_int8_qat=c.conv_int8_qat,
                     conv_int8_calibrate=c.conv_int8_calibrate,
                     conv_int8_scales=scales,
                     upsample_d2s_conv=c.d2s_via_conv,
                     name=f"level_{l}")
            for l in range(1, n + 1)
        ]
        if c.use_convlstm:
            self.lstms = [
                ConvLSTMCell(features=c.convlstm_features, dtype=dtype,
                             param_dtype=pdtype,
                             quant=("calib" if c.conv_int8_calibrate else
                                    bool(c.conv_int8 and c.conv_int8_lstm)),
                             quant_scales=(scales if c.conv_int8_lstm
                                           else None),
                             name=f"lstm_{l}")
                for l in range(1, n + 1)
            ]

    @property
    def downsample_factor(self) -> int:
        return self.cfg.stem_factor * 2 ** (len(self.cfg.channel_mult) - 1)

    def initial_state(self, batch: int, height: int, width: int) -> list[State]:
        return initial_state(self.cfg, batch, height, width)

    def __call__(self, window: jax.Array, states: list[State],
                 producer_clamp: bool = False):
        """window (B, K, H, W, 3) blurry keys (unpacked), OR already-packed
        (B, K, H/f, W/f, 3f^2) frames; states as from initial_state.

        ``producer_clamp`` (inference only): apply the stability clamp in
        the producing backbone's fp32 tail instead of consume-side, so each
        level's output is materialized once.  Emitted frames are then
        clamped to [-0.5, 1.5] — identical final video, since eval/emission
        clips to [0, 1] anyway (clip∘clip ≡ clip).  Training keeps the
        consume-side clamp so supervision sees raw estimates.

        Returns (outputs, new_states): outputs is a list over levels, entry l
        shaped (B, K-1-l, H/f, W/f, 3f^2) in the compute dtype — PACKED
        sharp frames at that level's timestamps (see level_output_times).
        Unpack with ``bin_tpu.ops.pixel_shuffle.depth_to_space(o, f)``; the
        Charbonnier loss and PSNR are pointwise and can consume packed
        frames directly (see backbone.py for why packing stays internal).
        """
        from bin_tpu.ops.pixel_shuffle import input_pack_fn

        c = self.cfg
        if window.shape[-1] == 3:
            # cast BEFORE packing: the space-to-depth transpose of a bf16
            # tensor is ~10x cheaper than fp32 (measured; the head conv
            # casts to the compute dtype anyway)
            s2d = input_pack_fn(c)
            window = s2d(window.astype(jnp.dtype(c.dtype)), c.stem_factor)
        b, k, h, w, _ = window.shape
        if k != c.window_size:
            raise ValueError(f"window has {k} keys, config says {c.window_size}")

        frames = window  # (B, P+1, h, w, 3f^2) at each level
        outputs = []
        new_states = []
        cpk = window.shape[-1]  # packed channel count (3 * stem_factor^2)
        for idx, backbone in enumerate(self.backbones):
            p = frames.shape[1] - 1  # pairs at this level
            if c.clamp_intermediate and not producer_clamp and idx > 0:
                # bound what this level consumes (clip commutes with the
                # slice/reshape below; placed consume-side so XLA fuses it
                # into the head conv's input): prevents multiplicative
                # runaway through the level chain after a bad train step,
                # while supervision sees the raw estimates
                frames = jnp.clip(frames, -0.5, 1.5)
            pa = frames[:, :-1].reshape(b * p, h, w, cpk)
            pb = frames[:, 1:].reshape(b * p, h, w, cpk)
            if c.use_convlstm:
                hid = states[idx][0]
                ctx = jnp.repeat(hid, p, axis=0)  # (B*P, h', w', F), pair-broadcast
            else:
                ctx = None
            sharp, feats = backbone(
                pa, pb, context=ctx,
                clamp_output=c.clamp_intermediate and producer_clamp)
            sharp = sharp.reshape(b, p, h, w, cpk)
            outputs.append(sharp)
            if c.use_convlstm:
                fh, fw, fc = feats.shape[1:]
                feats = feats.reshape(b, p, fh, fw, fc).mean(axis=1)
                new_states.append(self.lstms[idx](feats, states[idx]))
            frames = sharp
        return outputs, new_states
