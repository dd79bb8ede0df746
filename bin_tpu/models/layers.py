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


class ConvBlock(nn.Module):
    """conv3x3 + LeakyReLU."""

    features: int
    slope: float = 0.1
    strides: int = 1
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = conv3x3(self.features, strides=self.strides, dtype=self.dtype,
                    param_dtype=self.param_dtype)(x)
        return nn.leaky_relu(x, self.slope)


class ResBlock(nn.Module):
    """conv-LeakyReLU-conv with identity skip (the reference's residual
    block family; SURVEY.md §3.2 'stacked conv + LeakyReLU + residual')."""

    features: int
    slope: float = 0.1
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = conv3x3(self.features, dtype=self.dtype, param_dtype=self.param_dtype)(x)
        h = nn.leaky_relu(h, self.slope)
        h = conv3x3(self.features, dtype=self.dtype, param_dtype=self.param_dtype)(h)
        return x + h


class Downsample(nn.Module):
    """Strided-conv 2x downsampling + LeakyReLU (encoder scale transition)."""

    features: int
    slope: float = 0.1
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = conv3x3(self.features, strides=2, dtype=self.dtype,
                    param_dtype=self.param_dtype)(x)
        return nn.leaky_relu(x, self.slope)


class Upsample(nn.Module):
    """Bilinear 2x upsample + conv3x3 + LeakyReLU (decoder scale transition,
    matching the reference's bilinear-interpolate-then-conv pattern)."""

    features: int
    slope: float = 0.1
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        from bin_tpu.ops.resize import upsample2x
        x = upsample2x(x)
        x = conv3x3(self.features, dtype=self.dtype, param_dtype=self.param_dtype)(x)
        return nn.leaky_relu(x, self.slope)
