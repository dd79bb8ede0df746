"""Fused bilinear-2x-upsample + 3x3 conv as one low-resolution phase conv.

The decoder's ``upsample2x -> conv3x3`` pattern (reference: bilinear
F.interpolate then Conv2d, SURVEY.md §3.2) costs more than its FLOPs on TPU:
the interleave materializes the 2x tensor and surrounds the conv with
pad/copy ops, and the conv itself runs on a 4x-larger input (measured
~12 ms of a 65 ms flagship window step — tools/attribute_trace.py).

Because bilinear upsampling is linear, the composition is EXACTLY a 4-phase
filter bank at the LOW resolution: for output phase p in {0,1} per axis,

    out[2i+p] = sum_e W[e] * y[2i+p+e],   y = bilinear up of x (edge-clamped)

collapses to a 3-tap filter over x[i-1..i+1] with per-phase weights

    phase 0: (.75*W[-1] + .25*W[0],  .25*W[-1] + .75*W[0] + .75*W[1],  .25*W[1])
    phase 1: (.25*W[-1],  .75*W[-1] + .75*W[0] + .25*W[1],  .25*W[0] + .75*W[1])

i.e. ONE conv3x3 with 4*C_out channels on x (plus a depth-to-space), same
FLOPs, no 2x intermediate.

Border convention: the conv uses REPLICATE padding (not zero-SAME).  With
replicate padding the identity is exact at every output pixel — the
replicate-padded phase conv reproduces both the upsample's edge clamp and
the conv's replicated border rows with no correction terms (a zero-SAME
border would need 4 extra slab convs + splices per call, measured to cost
more than the fusion saved).  Replicate borders are also the natural choice
for image synthesis (no border darkening).  ``upsample2x_conv`` therefore
equals ``conv3x3_replicate(upsample2x(x)) + bias`` to fp32 associativity
(tests/test_fused_upsample.py pins this).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

__all__ = ["upsample2x_conv", "upsample2x_conv_reference", "phase_kernel"]

# A[p, e, d]: weight of tap x[i+d-1] in y[2i+p+(e-1)] (1D, interior).
_A = np.zeros((2, 3, 3), np.float32)
_A[0] = [[0.75, 0.25, 0.0],   # p=0, e=-1: y[2i-1] = .75 x[i-1] + .25 x[i]
         [0.25, 0.75, 0.0],   # p=0, e= 0: y[2i]   = .25 x[i-1] + .75 x[i]
         [0.0, 0.75, 0.25]]   # p=0, e=+1: y[2i+1] = .75 x[i]   + .25 x[i+1]
_A[1] = [[0.25, 0.75, 0.0],   # p=1, e=-1: y[2i]
         [0.0, 0.75, 0.25],   # p=1, e= 0: y[2i+1]
         [0.0, 0.25, 0.75]]   # p=1, e=+1: y[2i+2] = .25 x[i] + .75 x[i+1]


def phase_kernel(kernel: jax.Array) -> jax.Array:
    """(3, 3, Cin, Cout) conv kernel -> (3, 3, Cin, 4*Cout) phase bank.

    Output channel layout (py, px, co) — pixel-major, matching
    ``pixel_shuffle.depth_to_space``.
    """
    a = jnp.asarray(_A, kernel.dtype)
    # K[py,px,dy,dx,ci,co] = sum_{e,g} A[py,e,dy] A[px,g,dx] W[e,g,ci,co]
    k = jnp.einsum("ped,qgf,egio->pqdfio", a, a, kernel)
    ph, pw, kh, kw, ci, co = k.shape
    return k.transpose(2, 3, 4, 0, 1, 5).reshape(kh, kw, ci, ph * pw * co)


def upsample2x_conv_reference(x: jax.Array, kernel: jax.Array,
                              bias: jax.Array) -> jax.Array:
    """Unfused reference: upsample2x, replicate-pad, 3x3 VALID conv."""
    from bin_tpu.ops.resize import upsample2x

    up = upsample2x(x)
    up = jnp.pad(up, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
    out = jax.lax.conv_general_dilated(
        up, kernel, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return out + bias


def upsample2x_conv(x: jax.Array, kernel: jax.Array, bias: jax.Array,
                    d2s_conv: bool = False) -> jax.Array:
    """``conv3x3_replicate(upsample2x(x), kernel) + bias`` in one pass.

    x: (B, N, M, Cin); kernel (3, 3, Cin, Cout); returns (B, 2N, 2M, Cout).

    ``d2s_conv``: do the phase interleave with the one-hot transposed conv
    (pixel_shuffle.depth_to_space_conv, bit-exact) instead of the reshape/
    moveaxis form, so the upsample output is produced BY a convolution and
    inherits the conv-preferred layout — the reshape form was the one
    standard-layout producer inside the backbone and every downstream
    skip/residual add paid layout copies around it (round-4 HLO audit,
    BASELINE.md).
    """
    from bin_tpu.ops.pixel_shuffle import depth_to_space, depth_to_space_conv

    kernel = kernel.astype(x.dtype)
    bias = bias.astype(x.dtype)
    kp = phase_kernel(kernel)
    x_pad = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
    core = jax.lax.conv_general_dilated(
        x_pad, kp, window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    d2s = depth_to_space_conv if d2s_conv else depth_to_space
    return d2s(core + jnp.tile(bias, 4), 2)
