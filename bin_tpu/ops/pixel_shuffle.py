"""Space-to-depth / depth-to-space (pixel un/shuffle).

The TPU-native stem trick (see tools/profile_fullres.py measurements):
convolutions at 720p with C=64 run at ~27 TFLOP/s on v5e because 64 channels
fill only half the 128-wide vector lanes; the SAME FLOPs at half resolution
with 4x channels run at 78-247 TFLOP/s.  The backbone therefore folds 2x2
(or 4x4) pixel blocks into channels at the stem and unfolds at the tail,
keeping every conv at lane-friendly channel counts.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["space_to_depth", "depth_to_space"]


def space_to_depth(x: jax.Array, factor: int) -> jax.Array:
    """(..., H, W, C) → (..., H/f, W/f, C*f*f).  Block layout: output channel
    index = (dy * f + dx) * C + c (pixel-major, channel-minor)."""
    if factor == 1:
        return x
    *lead, h, w, c = x.shape
    if h % factor or w % factor:
        raise ValueError(f"spatial dims {(h, w)} not divisible by {factor}")
    x = x.reshape(*lead, h // factor, factor, w // factor, factor, c)
    x = jnp.moveaxis(x, (-4, -2), (-3, -2))  # (..., H/f, W/f, fy, fx, C)
    return x.reshape(*lead, h // factor, w // factor, factor * factor * c)


def depth_to_space(x: jax.Array, factor: int) -> jax.Array:
    """(..., H, W, C*f*f) → (..., H*f, W*f, C), inverse of space_to_depth."""
    if factor == 1:
        return x
    *lead, h, w, cff = x.shape
    c = cff // (factor * factor)
    x = x.reshape(*lead, h, w, factor, factor, c)
    x = jnp.moveaxis(x, (-3, -2), (-4, -2))  # (..., H, fy, W, fx, C)
    return x.reshape(*lead, h * factor, w * factor, c)
