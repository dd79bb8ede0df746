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


def _interleave2(a: jax.Array, b: jax.Array, axis: int) -> jax.Array:
    """Elementwise interleave along ``axis``: [a0, b0, a1, b1, ...]."""
    stacked = jnp.stack([a, b], axis=axis + 1 if axis >= 0 else axis)
    shape = list(a.shape)
    shape[axis] *= 2
    return stacked.reshape(shape)


def upsample2x(x: jax.Array) -> jax.Array:
    """Exact 2x bilinear upsample, half-pixel centers (matches
    jax.image.resize('bilinear') and torch align_corners=False).

    Implemented as shifted weighted sums + interleaves instead of the
    gather/select lowering of jax.image.resize: output rows are
      out[2i]   = 0.25*in[i-1] + 0.75*in[i]   (edge-clamped)
      out[2i+1] = 0.75*in[i]   + 0.25*in[i+1]
    per spatial axis — pure VPU arithmetic that XLA fuses into neighboring
    ops (device traces showed the gather form costing ~1 ms per call in
    the decoder; see docs/DESIGN.md).
    """
    def axis_up(v: jax.Array, axis: int) -> jax.Array:
        prev = jnp.concatenate([v.take(jnp.array([0]), axis=axis),
                                jax.lax.slice_in_dim(v, 0, v.shape[axis] - 1,
                                                     axis=axis)], axis=axis)
        nxt = jnp.concatenate([jax.lax.slice_in_dim(v, 1, v.shape[axis],
                                                    axis=axis),
                               v.take(jnp.array([v.shape[axis] - 1]),
                                      axis=axis)], axis=axis)
        even = 0.25 * prev + 0.75 * v
        odd = 0.75 * v + 0.25 * nxt
        return _interleave2(even, odd, axis)

    x = axis_up(x, x.ndim - 3)  # height
    x = axis_up(x, x.ndim - 2)  # width
    return x


def downsample2x(x: jax.Array) -> jax.Array:
    """2x2 average-pool downsample (the reference's pyramid downsampling)."""
    h, w = x.shape[-3], x.shape[-2]
    if h % 2 or w % 2:
        raise ValueError(f"spatial dims must be even, got {(h, w)}")
    lead = x.shape[:-3]
    x = x.reshape(lead + (h // 2, 2, w // 2, 2, x.shape[-1]))
    return x.mean(axis=(-4, -2))
