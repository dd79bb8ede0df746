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

import jax
import jax.numpy as jnp
from jax import lax

__all__ = ["int8_conv", "quantize_symmetric"]


def quantize_symmetric(x: jax.Array, axis=None) -> tuple[jax.Array, jax.Array]:
    """Symmetric abs-max int8 quantization; returns (q, scale) with
    x ≈ q * scale.  ``axis``: reduction axes KEPT per-channel (None =
    per-tensor)."""
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=axis, keepdims=axis is not None)
    scale = jnp.maximum(amax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -127, 127)
    return q.astype(jnp.int8), scale


def int8_conv(x: jax.Array, kernel: jax.Array, bias: jax.Array | None,
              strides: tuple[int, int] = (1, 1),
              padding: str = "SAME") -> jax.Array:
    """PTQ conv: int8 x int8 -> int32 MXU conv, fp32 dequant (+ bias).

    kernel (kh, kw, cin, cout) fp32/bf16 — quantized per-output-channel
    in-graph (constant-folded under jit).  Output fp32.
    """
    qk, kscale = quantize_symmetric(kernel, axis=(0, 1, 2))  # (1,1,1,cout)
    qx, ascale = quantize_symmetric(x)                        # per-tensor
    out = lax.conv_general_dilated(
        qx, qk, strides, padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)
    out = out.astype(jnp.float32) * (ascale * kscale[0, 0, 0])
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    return out
