"""Backbone: U-Net-style encoder-decoder synthesizing one sharp frame from
two (blurry or refined) input frames.

Reference (SURVEY.md §3.2 'Backbone encoder-decoder' [P], BASELINE.json:5):
concat two RGB frames → conv/LeakyReLU encoder with two downsamples →
residual blocks at the bottleneck → decoder with bilinear upsampling + skip
connections → 3-channel residual added to the average of the two inputs.

TPU-native choices:
  * NHWC throughout; channel widths are multiples of the 128-lane register
    tile at the bottleneck where most FLOPs live.
  * ``stem_factor`` space-to-depth: the input pair is pixel-unshuffled f x f
    at the stem and the residual is depth-to-space'd back at the tail, so
    every conv runs at H/f x W/f with f^2-wider channels.  Measured on v5e
    (tools/profile_fullres.py): equal-FLOP convs run 3x faster at /2 + 2x
    channels and 9x faster at /4 + 4x channels than at 720p with C=64,
    which fills only half the 128-wide vector lanes.
  * The pyramid runs this backbone on ALL adjacent frame pairs of a level in
    one call by folding the pair axis into the batch axis — large batched
    convs keep the MXU fed instead of a Python loop of small ones.
  * ``context`` injects the inter-pyramid ConvLSTM hidden state (PRF) at the
    bottleneck via a 1x1 conv; the backbone also returns its bottleneck
    features so the caller can update the ConvLSTM.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from bin_tpu.models.layers import ConvBlock, Downsample, ResBlock, Upsample, conv1x1, conv3x3

__all__ = ["Backbone"]


class Backbone(nn.Module):
    base_features: int = 64
    channel_mult: tuple[int, ...] = (1, 2, 4)
    num_res_blocks: int = 4
    slope: float = 0.1
    stem_factor: int = 1
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32
    fused_upsample: bool = True
    conv_int8: bool = False        # PTQ int8 convs (inference experiment;
                                   # tail + context_proj stay float — see
                                   # ops/quant.py)
    conv_int8_min_cin: int = 0     # quantize only convs with Cin >= this
    conv_int8_qat: bool = False    # TRAINING-time fake-quant (STE) on the
                                   # same conv set: fine-tune to absorb the
                                   # int8 deployment error (overrides
                                   # conv_int8's op choice, same scoping)
    conv_int8_calibrate: bool = False  # record per-conv input abs-max into
                                   # the mutable quant_stats collection
                                   # (tools/calibrate_int8.py pass)
    conv_int8_scales: Any = None   # static calibrated activation scales
                                   # ({conv path -> float}); kills the
                                   # dynamic abs-max reduce per conv
    upsample_d2s_conv: bool = False  # decoder phase interleave via one-hot
                                   # transposed conv (bit-exact layout fix;
                                   # ops/fused_upsample.py, BASELINE.md
                                   # round-4 HLO audit)

    @nn.compact
    def __call__(self, frame_a: jax.Array, frame_b: jax.Array,
                 context: jax.Array | None = None,
                 clamp_output: bool = False):
        """Two PACKED frames → (packed sharp frame, bottleneck feats).

        Packed domain: frames are space-to-depth'd by ``stem_factor``, i.e.
        (B, H/f, W/f, 3*f^2) — the caller (BINPyramid) packs the window ONCE
        and every level passes packed frames straight through, so no
        full-resolution reshape/copy appears anywhere inside the pyramid
        (per-op traces showed those transposes + fp32 720p copies eating
        ~1/3 of the window step before this design).  Charbonnier/PSNR are
        pointwise and therefore identical in packed domain; only final
        assembly/eval unpacks.  The residual is added to the packed pair
        average in fp32, then cast back to the compute dtype.
        """
        chans = [self.base_features * m for m in self.channel_mult]
        x = jnp.concatenate([frame_a, frame_b], axis=-1).astype(self.dtype)

        q = ("calib" if self.conv_int8_calibrate else
             "qat" if self.conv_int8_qat else self.conv_int8)
        qmc = self.conv_int8_min_cin
        qsc = self.conv_int8_scales
        x = ConvBlock(chans[0], self.slope, dtype=self.dtype,
                      param_dtype=self.param_dtype, quant=q,
                      quant_min_cin=qmc, quant_scales=qsc, name="head")(x)
        skips = []
        for i, ch in enumerate(chans[:-1]):
            x = ResBlock(ch, self.slope, dtype=self.dtype, quant=q,
                         quant_min_cin=qmc, quant_scales=qsc,
                         param_dtype=self.param_dtype, name=f"enc_{i}")(x)
            skips.append(x)
            x = Downsample(chans[i + 1], self.slope, dtype=self.dtype,
                           param_dtype=self.param_dtype, quant=q,
                           quant_min_cin=qmc, quant_scales=qsc,
                           name=f"down_{i}")(x)

        if context is not None:
            x = x + conv1x1(chans[-1], dtype=self.dtype,
                            param_dtype=self.param_dtype,
                            name="context_proj")(context.astype(self.dtype))

        for i in range(self.num_res_blocks):
            x = ResBlock(chans[-1], self.slope, dtype=self.dtype, quant=q,
                         quant_min_cin=qmc, quant_scales=qsc,
                         param_dtype=self.param_dtype, name=f"mid_{i}")(x)
        feats = x  # bottleneck features (ConvLSTM input, PRF)

        for i, ch in reversed(list(enumerate(chans[:-1]))):
            x = Upsample(ch, self.slope, dtype=self.dtype,
                         param_dtype=self.param_dtype,
                         fused=self.fused_upsample,
                         d2s_conv=self.upsample_d2s_conv, name=f"up_{i}")(x)
            x = x + skips[i]
            x = ResBlock(ch, self.slope, dtype=self.dtype, quant=q,
                         quant_min_cin=qmc, quant_scales=qsc,
                         param_dtype=self.param_dtype, name=f"dec_{i}")(x)

        # Zero-init tail: at init every level predicts exactly the average of
        # its two inputs, keeping early pyramid levels in-range for deeper
        # ones (the residual-synthesis analog of zero-init'd output heads).
        residual = nn.Conv(3 * self.stem_factor ** 2, (3, 3), padding="SAME",
                           kernel_init=nn.initializers.zeros,
                           dtype=self.dtype, param_dtype=self.param_dtype,
                           name="tail")(x)
        base = 0.5 * (frame_a.astype(jnp.float32) + frame_b.astype(jnp.float32))
        sharp = base + residual.astype(jnp.float32)
        if clamp_output:
            # Producer-side stability clamp (inference): fused into this
            # fp32 tail epilogue so ONE clamped tensor is materialized,
            # instead of the consume-side clamp which forces XLA to keep
            # both the raw output (for emission) and a clamped copy (for
            # the next level) — measured ~10% of the 720p window step.
            sharp = jnp.clip(sharp, -0.5, 1.5)
        return sharp.astype(self.dtype), feats
