"""Bilinear resize ops for pyramid up/down-sampling.

The reference uses ``torch.nn.functional.interpolate(mode='bilinear',
align_corners=False)`` between pyramid levels (SURVEY.md §3.2 [P][R]).
``jax.image.resize(method='bilinear')`` uses the same half-pixel-center
convention, so outputs are comparable for the parity twin; both lower to
gathers/convs that XLA fuses on TPU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["resize_bilinear", "upsample2x", "downsample2x"]


def resize_bilinear(x: jax.Array, height: int, width: int) -> jax.Array:
    """Resize (..., H, W, C) to (..., height, width, C), half-pixel centers."""
    out_shape = x.shape[:-3] + (height, width, x.shape[-1])
    return jax.image.resize(x, out_shape, method="bilinear")


def upsample2x(x: jax.Array) -> jax.Array:
    h, w = x.shape[-3], x.shape[-2]
    return resize_bilinear(x, 2 * h, 2 * w)


def downsample2x(x: jax.Array) -> jax.Array:
    """2x2 average-pool downsample (the reference's pyramid downsampling)."""
    h, w = x.shape[-3], x.shape[-2]
    if h % 2 or w % 2:
        raise ValueError(f"spatial dims must be even, got {(h, w)}")
    lead = x.shape[:-3]
    x = x.reshape(lead + (h // 2, 2, w // 2, 2, x.shape[-1]))
    return x.mean(axis=(-4, -2))
