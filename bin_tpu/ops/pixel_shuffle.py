"""Space-to-depth / depth-to-space (pixel un/shuffle).

The TPU-native stem trick (see tools/profile_fullres.py measurements):
convolutions at 720p with C=64 run at ~27 TFLOP/s on v5e because 64 channels
fill only half the 128-wide vector lanes; the SAME FLOPs at half resolution
with 4x channels run at 78-247 TFLOP/s.  The backbone therefore folds 2x2
(or 4x4) pixel blocks into channels at the stem and unfolds at the tail,
keeping every conv at lane-friendly channel counts.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

__all__ = ["space_to_depth", "depth_to_space", "space_to_depth_conv",
           "depth_to_space_conv", "input_pack_fn"]


def input_pack_fn(model_cfg):
    """The configured space-to-depth implementation (A/B surface):
    reshape/transpose (default, XLA) or one-hot strided conv
    (``s2d_via_conv`` — re-measured on the post-d2s graph at +0.77%,
    under the 1% promotion gate, runs/r5_s2dconv/). Bit-exact both ways.
    The third impl (Pallas VMEM relayout, ops/pallas/s2d_pack.py) lost its
    config surface when Mosaic proved unable to compile it on this
    backend — see the ModelConfig flag graveyard."""
    if getattr(model_cfg, "s2d_via_conv", False):
        return space_to_depth_conv
    return space_to_depth


def final_unpack_via_conv(model_cfg) -> bool:
    """Whether the FINAL full-resolution unpack (assemble_clip /
    Model.unpack) should use the one-hot conv form.  Tri-state config
    (model.d2s_final_via_conv): "follow" inherits d2s_via_conv — the same
    layout argument applies at the tail — while "true"/"false" pin it for
    an independent A/B (the tail's Cout=3 conv is a different beast from
    the decoder's 128-channel ones, so it gets its own measurement).
    Round-5 chip A/B (runs/r5_final_unpack/VERDICT.json): conv form
    41.65 fps vs reshape 41.82 — within noise, so the shipped default is
    "false" (reshape); the tail unpack is outside the windowed hot loop
    and its layout never feeds another conv, so the decoder argument
    doesn't transfer."""
    mode = str(getattr(model_cfg, "d2s_final_via_conv", "follow")).lower()
    if mode in ("true", "1", "yes"):
        return True
    if mode in ("false", "0", "no"):
        return False
    if mode != "follow":
        # A typo'd A/B pin ("ture", "off", ...) must not silently measure
        # the follow branch — this flag exists for within-noise 1% calls.
        raise ValueError(
            f"model.d2s_final_via_conv={mode!r}: expected 'true', 'false', "
            "or 'follow'")
    return bool(getattr(model_cfg, "d2s_via_conv", False))


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


def _s2d_kernel(factor: int, c: int, dtype) -> np.ndarray:
    """One-hot (f, f, C, f*f*C) kernel implementing space_to_depth's exact
    channel layout: out channel (dy*f + dx)*C + c reads pixel (dy, dx)."""
    k = np.zeros((factor, factor, c, factor * factor * c), np.float32)
    for dy in range(factor):
        for dx in range(factor):
            for ch in range(c):
                k[dy, dx, ch, (dy * factor + dx) * c + ch] = 1.0
    return k.astype(dtype)


def space_to_depth_conv(x: jax.Array, factor: int) -> jax.Array:
    """space_to_depth as a one-hot strided conv — bit-exact (each output
    element sums exactly ONE nonzero tap, so no rounding at any dtype).

    Why it exists: XLA lowers the reshape→transpose→reshape form of the
    720p input pack to layout copies it executes at ~20 GB/s (trace r3:
    copy.461/462, 2.3 ms/window), because the innermost dim of the
    transpose is the 3-wide RGB axis — pathological for the (8,128) tile.
    The MXU's strided-conv input pipeline does the same data movement as
    part of a conv it is built to feed.  A/B'd via model.s2d_via_conv."""
    if factor == 1:
        return x
    *lead, h, w, c = x.shape
    if h % factor or w % factor:
        raise ValueError(f"spatial dims {(h, w)} not divisible by {factor}")
    kernel = jnp.asarray(_s2d_kernel(factor, c, x.dtype))
    out = jax.lax.conv_general_dilated(
        x.reshape(-1, h, w, c), kernel, (factor, factor), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return out.reshape(*lead, h // factor, w // factor, factor * factor * c)


def _d2s_kernel(factor: int, c: int, dtype) -> np.ndarray:
    """One-hot (f, f, f*f*C, C) transposed-conv kernel implementing
    depth_to_space's exact layout: output pixel phase (fy, fx) channel ch
    reads input channel (fy*f + fx)*C + ch."""
    k = np.zeros((factor, factor, factor * factor * c, c), np.float32)
    for fy in range(factor):
        for fx in range(factor):
            for ch in range(c):
                # conv_transpose(transpose_kernel=False) applies the kernel
                # spatially mirrored; index taps flipped so output phase
                # (fy, fx) lands where depth_to_space puts it
                k[factor - 1 - fy, factor - 1 - fx,
                  (fy * factor + fx) * c + ch, ch] = 1.0
    return k.astype(dtype)


def depth_to_space_conv(x: jax.Array, factor: int) -> jax.Array:
    """depth_to_space as a one-hot stride-f transposed conv — bit-exact
    (each output element is the dot of one 1.0 with its source element;
    all other products are exact zeros at any dtype).

    Why it exists (round-4 HLO layout audit, BASELINE.md): XLA's TPU
    backend rewrites this model's convs into a transposed ``0b1f`` form,
    but the reshape/moveaxis depth_to_space in the fused decoder upsample
    emits a standard-layout tensor — every skip/residual add downstream
    then materializes in standard form and pays layout copies back into
    the conv form (the [360,3,640,128] three-layout thrash, ~10 ms of the
    81 ms stem-2 window step).  Produced BY a convolution, the upsample
    output is born in the conv-preferred form instead.  A/B surface via
    model.d2s_via_conv."""
    if factor == 1:
        return x
    *lead, h, w, cff = x.shape
    c = cff // (factor * factor)
    kernel = jnp.asarray(_d2s_kernel(factor, c, x.dtype))
    out = jax.lax.conv_transpose(
        x.reshape(-1, h, w, cff), kernel, (factor, factor), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return out.reshape(*lead, h * factor, w * factor, c)


def depth_to_space(x: jax.Array, factor: int) -> jax.Array:
    """(..., H, W, C*f*f) → (..., H*f, W*f, C), inverse of space_to_depth."""
    if factor == 1:
        return x
    *lead, h, w, cff = x.shape
    c = cff // (factor * factor)
    x = x.reshape(*lead, h, w, factor, factor, c)
    x = jnp.moveaxis(x, (-3, -2), (-4, -2))  # (..., H, fy, W, fx, C)
    return x.reshape(*lead, h * factor, w * factor, c)
