"""Shared NN building blocks (reference L1: torch.nn Conv2d/LeakyReLU etc.,
SURVEY.md §2).  All modules are NHWC — the natural TPU layout: XLA tiles the
trailing channel dim onto the 128-wide vector lanes and lowers 3x3 convs to
MXU matmuls over (spatial patch, Cin)x(Cin, Cout)."""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

__all__ = ["conv3x3", "conv1x1", "ConvBlock", "ResBlock", "Downsample", "Upsample"]

# He/Kaiming fan-in init — matches the torch Conv2d default family the
# reference relies on; exact init parity is irrelevant (the parity twin
# copies weights), but the scale keeps training dynamics comparable.
_KERNEL_INIT = nn.initializers.variance_scaling(2.0, "fan_in", "truncated_normal")


def conv3x3(features: int, *, strides: int = 1, dtype: Any = jnp.float32,
            param_dtype: Any = jnp.float32, name: str | None = None) -> nn.Conv:
    return nn.Conv(features, (3, 3), strides=(strides, strides), padding="SAME",
                   kernel_init=_KERNEL_INIT, dtype=dtype, param_dtype=param_dtype,
                   name=name)


def conv1x1(features: int, *, dtype: Any = jnp.float32,
            param_dtype: Any = jnp.float32, name: str | None = None) -> nn.Conv:
    return nn.Conv(features, (1, 1), padding="SAME", kernel_init=_KERNEL_INIT,
                   dtype=dtype, param_dtype=param_dtype, name=name)


def _conv3x3_maybe_quant(x, features, *, strides=1, dtype, param_dtype,
                         quant, quant_min_cin=0, quant_scales=None,
                         owner=None, name):
    """conv3x3 as nn.Conv (default) or as the int8 PTQ conv (ops/quant.py).

    Plain function, NOT a module: both branches create a child of the
    CALLER's scope named ``name`` holding {kernel, bias}, so the param tree
    is byte-identical either way and model.conv_int8 is a pure inference
    A/B flag over existing checkpoints.

    ``quant_min_cin`` scopes quantization to convs whose input channel
    count is at least that wide (static shape, resolved at trace time):
    the deep wide convs hold the FLOPs, the high-res narrow convs hold the
    fine detail, so the threshold is a quality/speed dial (BASELINE.md
    round-3 int8 table).

    ``quant`` modes: False = plain conv; True = deployed int8 PTQ conv;
    "mse" = int8 PTQ with MSE-optimal clipped weight scales (abs-max lets
    one outlier weight stretch a whole channel's grid — ops/quant.py);
    "qat" = training-time fake-quant conv (same quantizer, straight-through
    gradients — ops/quant.py:fake_quant_conv) so a fine-tune learns the
    deployment quantization error; "calib" = plain conv + record this
    conv's input abs-max into the mutable ``quant_stats`` collection
    (max-reduced across calls/windows/clips — tools/calibrate_int8.py).

    ``quant_scales``: static calibrated activation scales
    ({path key -> float}); with it the int8 path skips the dynamic abs-max
    reduction (see ops/quant.py int8_conv).  ``owner`` (the calling module)
    provides the path key and the sow scope; required for "calib" and for
    ``quant_scales``."""
    if quant == "calib":
        # record superset scope (min_cin=0): the serving scope dial only
        # ever narrows which keys get USED, never which exist
        owner.sow("quant_stats", f"{name}_amax",
                  jnp.max(jnp.abs(x.astype(jnp.float32))),
                  reduce_fn=jnp.maximum, init_fn=lambda: jnp.float32(0.0))
        quant = False
    if not quant or x.shape[-1] < quant_min_cin:
        return conv3x3(features, strides=strides, dtype=dtype,
                       param_dtype=param_dtype, name=name)(x)
    from bin_tpu.ops.quant import fake_quant_conv, int8_conv
    kernel, bias = _ConvParams((3, 3, x.shape[-1], features),
                               param_dtype, name=name)()
    if quant == "qat":
        out = fake_quant_conv(x, kernel, bias, strides=(strides, strides))
    else:
        act_scale = None
        if quant_scales is not None:
            from bin_tpu.ops.quant import lookup_act_scale
            act_scale = lookup_act_scale(
                quant_scales, "/".join((*owner.path, name)))
        out = int8_conv(x, kernel, bias, strides=(strides, strides),
                        weight_mse_clip=quant == "mse", act_scale=act_scale)
    return out.astype(dtype)


class ConvBlock(nn.Module):
    """conv3x3 + LeakyReLU."""

    features: int
    slope: float = 0.1
    strides: int = 1
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32
    quant: Any = False  # False | True (int8 PTQ) | "qat" | "calib"
    quant_min_cin: int = 0
    quant_scales: Any = None  # static calibrated act scales (layers doc)

    @nn.compact
    def __call__(self, x):
        x = _conv3x3_maybe_quant(x, self.features, strides=self.strides,
                                 dtype=self.dtype,
                                 param_dtype=self.param_dtype,
                                 quant=self.quant,
                                 quant_min_cin=self.quant_min_cin,
                                 quant_scales=self.quant_scales, owner=self,
                                 name="Conv_0")
        return nn.leaky_relu(x, self.slope)


class ResBlock(nn.Module):
    """conv-LeakyReLU-conv with identity skip (the reference's residual
    block family; SURVEY.md §3.2 'stacked conv + LeakyReLU + residual')."""

    features: int
    slope: float = 0.1
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32
    quant: Any = False  # False | True (int8 PTQ) | "qat" | "calib"
    quant_min_cin: int = 0
    quant_scales: Any = None  # static calibrated act scales (layers doc)

    @nn.compact
    def __call__(self, x):
        h = _conv3x3_maybe_quant(x, self.features, dtype=self.dtype,
                                 param_dtype=self.param_dtype,
                                 quant=self.quant,
                                 quant_min_cin=self.quant_min_cin,
                                 quant_scales=self.quant_scales, owner=self,
                                 name="Conv_0")
        h = nn.leaky_relu(h, self.slope)
        h = _conv3x3_maybe_quant(h, self.features, dtype=self.dtype,
                                 param_dtype=self.param_dtype,
                                 quant=self.quant,
                                 quant_min_cin=self.quant_min_cin,
                                 quant_scales=self.quant_scales, owner=self,
                                 name="Conv_1")
        return x + h


class Downsample(nn.Module):
    """Strided-conv 2x downsampling + LeakyReLU (encoder scale transition)."""

    features: int
    slope: float = 0.1
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32
    quant: Any = False  # False | True (int8 PTQ) | "qat" | "calib"
    quant_min_cin: int = 0
    quant_scales: Any = None  # static calibrated act scales (layers doc)

    @nn.compact
    def __call__(self, x):
        x = _conv3x3_maybe_quant(x, self.features, strides=2,
                                 dtype=self.dtype,
                                 param_dtype=self.param_dtype,
                                 quant=self.quant,
                                 quant_min_cin=self.quant_min_cin,
                                 quant_scales=self.quant_scales, owner=self,
                                 name="Conv_0")
        return nn.leaky_relu(x, self.slope)


class _ConvParams(nn.Module):
    """Bare conv kernel+bias holder; keeps the param tree identical to an
    nn.Conv child ("Conv_0": {kernel, bias}) while the op itself is fused."""

    kernel_shape: tuple
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self):
        kernel = self.param("kernel", _KERNEL_INIT, self.kernel_shape,
                            self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.kernel_shape[-1],), self.param_dtype)
        return kernel, bias


class Upsample(nn.Module):
    """Bilinear 2x upsample + conv3x3 (replicate-padded) + LeakyReLU
    (decoder scale transition, matching the reference's
    bilinear-interpolate-then-conv pattern).

    Computed as ONE fused phase-bank conv at the low resolution
    (ops/fused_upsample.py) — numerically equal to upsample-then-conv but
    without materializing the 2x intermediate.  The conv's border padding
    is REPLICATE (not zero): that makes the fusion exact at every pixel
    with no border correction, and avoids border darkening."""

    features: int
    slope: float = 0.1
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32
    fused: bool = True
    d2s_conv: bool = False  # phase interleave via one-hot transposed conv
                            # (bit-exact; see ops/fused_upsample.py)

    @nn.compact
    def __call__(self, x):
        import functools

        from bin_tpu.ops.fused_upsample import (upsample2x_conv,
                                                upsample2x_conv_reference)

        kernel, bias = _ConvParams((3, 3, x.shape[-1], self.features),
                                   self.param_dtype, name="Conv_0")()
        op = (functools.partial(upsample2x_conv, d2s_conv=self.d2s_conv)
              if self.fused else upsample2x_conv_reference)
        x = op(x.astype(self.dtype), kernel.astype(self.dtype),
               bias.astype(self.dtype))
        return nn.leaky_relu(x, self.slope)
