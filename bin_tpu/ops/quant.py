"""Post-training int8 quantized convolution (inference experiment).

The v5e's int8 peak (394 TOPS) is 2x its bf16 peak, and the flagship's
convs already run at 81-99% of the bf16 roofline (BASELINE.md round 2) —
int8 conv is the one remaining big single-chip throughput lever
(SURVEY.md §8 stage 6 spirit; VERDICT r2 item 9).

Scheme (standard symmetric PTQ):
  * weights: per-output-channel symmetric int8.  The kernel is a CONSTANT
    inside a jitted inference program, so the quantization folds away at
    compile time — no offline calibration pass, no checkpoint changes.
  * activations: dynamic per-tensor symmetric int8 (abs-max / 127), cost is
    one reduction + rescale, fused by XLA into neighbors.
  * accumulation in int32 (preferred_element_type), dequant + bias in fp32.

Feasibility gate: tools/bench_int8_conv.py measures whether XLA actually
lowers int8 conv to the fast MXU path on this chip; the model flag
(model.conv_int8) is an inference-only A/B surface, default off.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

__all__ = ["int8_conv", "quantize_symmetric", "fake_quant", "fake_quant_conv",
           "load_act_scales", "lookup_act_scale", "scales_calibrated_for"]


def lookup_act_scale(scales: dict, key: str) -> float:
    """Strict calibrated-scale lookup with remediation context.

    A missing key means the sidecar was calibrated against a DIFFERENT
    architecture/scope than the one being traced (e.g. a deeper variant,
    or conv_int8_lstm enabled after calibration) — failing loudly here is
    deliberate: a silent dynamic-scale fallback would un-gate the exact
    measurement the static-scales promotion ran (runs/r5_int8static/)."""
    if key not in scales:
        raise KeyError(
            f"no calibrated activation scale for conv {key!r} "
            f"(have {sorted(scales)[:8]}...); re-run "
            "tools/calibrate_int8.py against this architecture/scope")
    return scales[key]


@functools.lru_cache(maxsize=8)
def load_act_scales(path: str) -> dict:
    """Calibrated static activation scales (.npz written by
    tools/calibrate_int8.py): {conv path key -> fp32 scale}.  Cached per
    path — the scales are trace-time CONSTANTS (see int8_conv act_scale),
    so a process that rewrites the file must be a different process from
    the one serving with it (the tools are; documented there).

    A relative path that does not resolve against the CWD is retried
    against the repo root: BENCH_OVERRIDES.json records repo-relative
    paths, and the bench/serve entry points may run from anywhere.

    Dunder keys (``__calibrated_for__``, ...) are sidecar metadata, not
    conv scales — skipped here, read via scales_calibrated_for()."""
    import numpy as np
    data = np.load(_resolve_repo_relative(path))
    return {k: float(data[k]) for k in data.files if not k.startswith("__")}


def _resolve_repo_relative(path: str) -> str:
    import os
    if not os.path.isabs(path) and not os.path.exists(path):
        root = os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))))
        candidate = os.path.join(root, path)
        if os.path.exists(candidate):
            return candidate
    return path


def scales_calibrated_for(path: str) -> str | None:
    """The weights basename a scales sidecar was calibrated against
    (``__calibrated_for__`` metadata written by tools/calibrate_int8.py),
    or None for pre-provenance sidecars / unreadable files."""
    import numpy as np
    try:
        data = np.load(_resolve_repo_relative(path))
        if "__calibrated_for__" in data.files:
            return str(data["__calibrated_for__"])
    except Exception:
        pass
    return None


def quantize_symmetric(x: jax.Array, axis=None,
                       mse_clip: bool = False) -> tuple[jax.Array, jax.Array]:
    """Symmetric int8 quantization; returns (q, scale) with x ≈ q * scale.
    ``axis``: reduction axes KEPT per-channel (None = per-tensor).

    ``mse_clip=True`` replaces the abs-max scale with the MSE-optimal
    clipped scale: per channel, search scale candidates c·amax/127 for
    c ∈ {0.50 … 1.00} and keep the one minimizing the quantization error
    ‖x − dq(q(x))‖².  Abs-max lets a single outlier weight stretch the
    whole channel's grid; clipping trades that outlier's error for a finer
    grid everywhere else.  Intended for WEIGHTS (constants under jit — the
     21-candidate search folds away at compile time); for dynamic
    activation quantization it would add 21 reductions per call."""
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=axis, keepdims=axis is not None)
    scale = jnp.maximum(amax, 1e-8) / 127.0
    if mse_clip:
        cands = jnp.linspace(0.5, 1.0, 21)
        # err[i] = sum over x of (x - dq_i(x))^2, per kept channel
        best_err = None
        best_scale = scale
        for c in list(cands):
            s = jnp.maximum(amax * c, 1e-8) / 127.0
            dq = jnp.clip(jnp.round(xf / s), -127, 127) * s
            err = jnp.sum(jnp.square(xf - dq), axis=axis,
                          keepdims=axis is not None)
            if best_err is None:
                best_err, best_scale = err, s
            else:
                take = err < best_err
                best_err = jnp.where(take, err, best_err)
                best_scale = jnp.where(take, s, best_scale)
        scale = best_scale
    q = jnp.clip(jnp.round(xf / scale), -127, 127)
    return q.astype(jnp.int8), scale


def fake_quant(x: jax.Array, axis=None) -> jax.Array:
    """Quantize-dequantize with a straight-through gradient (QAT).

    Forward applies EXACTLY the quantizer of ``quantize_symmetric`` /
    ``int8_conv`` (dynamic abs-max scale, round, clip to ±127) and returns
    the dequantized value; backward passes gradients straight through the
    round/clip (the scale is stop-gradient'd — plain STE, no learned-scale
    machinery).  Training with this in the conv path teaches the weights to
    live with deployment quantization error instead of paying it post hoc.
    """
    xf = x.astype(jnp.float32)
    amax = lax.stop_gradient(
        jnp.max(jnp.abs(xf), axis=axis, keepdims=axis is not None))
    scale = jnp.maximum(amax, 1e-8) / 127.0
    qdq = jnp.clip(jnp.round(xf / scale), -127, 127) * scale
    return (xf + lax.stop_gradient(qdq - xf)).astype(x.dtype)


def fake_quant_conv(x: jax.Array, kernel: jax.Array, bias: jax.Array | None,
                    strides: tuple[int, int] = (1, 1),
                    padding: str = "SAME") -> jax.Array:
    """QAT twin of ``int8_conv``: conv of fake-quantized activations and
    per-output-channel fake-quantized weights, fp32 accumulation.

    Numerics: q_x·s_x ⊛ q_k·s_k = (q_x ⊛ q_k)·s_x·s_k, so the fp32 conv of
    dequantized values equals the deployed int8 path's int32 conv wherever
    the integer dot product fits fp32's 24-bit mantissa (always true for
    the narrow convs; within ~1 ulp for the widest).  The conv runs in fp32
    deliberately — a bf16 conv would round the 14-bit q·s products and
    train against noise the int8 deployment does not have.  Output fp32;
    cast at the call site.
    """
    # Quantize in fp32 and STAY fp32 into the conv: fake_quant returns its
    # input dtype, and under bf16 training a cast back to bf16 would round
    # every dequantized q*s product (8 mantissa bits — the same order as
    # the int8 step) and re-introduce exactly the noise this path exists
    # to avoid.
    qx = fake_quant(x.astype(jnp.float32))                       # per-tensor
    qk = fake_quant(kernel.astype(jnp.float32), axis=(0, 1, 2))  # per-channel
    out = lax.conv_general_dilated(
        qx, qk, strides, padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    return out


def int8_conv(x: jax.Array, kernel: jax.Array, bias: jax.Array | None,
              strides: tuple[int, int] = (1, 1),
              padding: str = "SAME",
              weight_mse_clip: bool = False,
              act_scale: float | None = None) -> jax.Array:
    """PTQ conv: int8 x int8 -> int32 MXU conv, fp32 dequant (+ bias).

    kernel (kh, kw, cin, cout) fp32/bf16 — quantized per-output-channel
    in-graph (constant-folded under jit).  Output fp32.
    ``weight_mse_clip``: MSE-optimal clipped weight scales instead of
    abs-max (see quantize_symmetric; compile-time cost only).
    ``act_scale``: STATIC calibrated activation scale (a Python float, a
    trace-time constant).  Without it the activation scale is dynamic
    abs-max — a full reduction over x that reads the tensor from HBM once
    for the max and again for the quantize, and serializes the quantize
    behind the reduce.  With it the quantize is pure elementwise (scale,
    round, clip, cast) and fuses into x's producer; activations beyond the
    calibrated range saturate at +-127, which is the quality trade the
    pinned-protocol eval gates (tools/calibrate_int8.py).
    """
    qk, kscale = quantize_symmetric(kernel, axis=(0, 1, 2),
                                    mse_clip=weight_mse_clip)  # (1,1,1,cout)
    if act_scale is None:
        qx, ascale = quantize_symmetric(x)                    # per-tensor
    else:
        ascale = jnp.float32(act_scale)
        qx = jnp.clip(jnp.round(x.astype(jnp.float32) / ascale),
                      -127, 127).astype(jnp.int8)
    out = lax.conv_general_dilated(
        qx, qk, strides, padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)
    out = out.astype(jnp.float32) * (ascale * kscale[0, 0, 0])
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    return out
