"""ConvLSTM cell — the PRF inter-pyramid recurrent unit.

Reference (SURVEY.md §3.2 'ConvLSTM cell' [P], BASELINE.json:5): a
hand-rolled convolutional LSTM whose gates are one convolution over
``concat([x, h])``; (h, c) persist across sliding-window time steps.

TPU-native: the gate convolution produces all 4*F gate channels in one conv
(one big MXU matmul), and the pointwise gate math (2 sigmoids, 2 tanhs, 3
multiplies, 1 add) is a single fused elementwise stage — optionally a Pallas
kernel (bin_tpu.ops.pallas.lstm_gates) that evaluates it in one VMEM pass;
the default path lets XLA fuse it.  The time axis is driven OUTSIDE the cell
by ``jax.lax.scan`` with a donated carry (bin_tpu.models.recurrent).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from bin_tpu.models.layers import _KERNEL_INIT

__all__ = ["ConvLSTMCell", "init_state", "lstm_gate_math"]


def init_state(batch: int, height: int, width: int, features: int,
               dtype: Any = jnp.float32) -> tuple[jax.Array, jax.Array]:
    """Zero (h, c) carry for one cell."""
    shape = (batch, height, width, features)
    return jnp.zeros(shape, dtype), jnp.zeros(shape, dtype)


def lstm_gate_math(gates: jax.Array, c: jax.Array, forget_bias: float = 1.0):
    """Pointwise LSTM update from stacked gate pre-activations (..., 4F).

    Split order: input, forget, cell-candidate, output.  Runs in fp32 —
    carried state must not accumulate bf16 rounding across long clips.
    """
    gates = gates.astype(jnp.float32)
    c = c.astype(jnp.float32)
    i, f, g, o = jnp.split(gates, 4, axis=-1)
    new_c = jax.nn.sigmoid(f + forget_bias) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
    new_h = jax.nn.sigmoid(o) * jnp.tanh(new_c)
    return new_h, new_c


class ConvLSTMCell(nn.Module):
    features: int
    kernel_size: tuple[int, int] = (3, 3)
    forget_bias: float = 1.0
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32
    quant: Any = False  # int8 PTQ on the gate conv (model.conv_int8_lstm):
    #                      the k(3,3,768,1024) gate conv is ~3.4 ms of bf16
    #                      left on the table by the backbone-only int8
    #                      scoping (round-4 trace).  Recurrent state math
    #                      stays fp32 — only the conv quantizes; the carry
    #                      still accumulates noise across windows, so this
    #                      ships measurement-gated like every int8 scope.
    #                      "calib" records the two input abs-maxes instead
    #                      (tools/calibrate_int8.py).
    quant_scales: Any = None  # static calibrated act scales: keys
    #                           "<path>/gates_x" and "<path>/gates_h"

    @nn.compact
    def __call__(self, x: jax.Array, state: tuple[jax.Array, jax.Array]):
        """x (B,h,w,Cin), state ((B,h,w,F), (B,h,w,F)) → (new_h, new_c)."""
        h, c = state
        inp = jnp.concatenate([x.astype(self.dtype), h.astype(self.dtype)], axis=-1)
        if self.quant == "calib":
            for nm, t in (("gates_x", x), ("gates_h", h)):
                self.sow("quant_stats", f"{nm}_amax",
                         jnp.max(jnp.abs(t.astype(jnp.float32))),
                         reduce_fn=jnp.maximum,
                         init_fn=lambda: jnp.float32(0.0))
        if self.quant and self.quant != "calib":
            from bin_tpu.models.layers import _ConvParams
            from bin_tpu.ops.quant import int8_conv
            kernel, bias = _ConvParams(
                (*self.kernel_size, inp.shape[-1], 4 * self.features),
                self.param_dtype, name="gates")()
            # Split the concat conv into conv(x,Kx)+conv(h,Kh) — exact in
            # float arithmetic, NOT under per-tensor activation int8: the
            # concat mixes the backbone features with the (-1,1) hidden
            # state under ONE abs-max scale, crushing whichever is smaller
            # (measured 0.51 max output deviation on the joint form vs
            # ~int8-normal when split; tests/test_quant.py lstm test).
            cx = x.shape[-1]
            sx = sh = None
            if self.quant_scales is not None:
                from bin_tpu.ops.quant import lookup_act_scale
                sx = lookup_act_scale(
                    self.quant_scales, "/".join((*self.path, "gates_x")))
                sh = lookup_act_scale(
                    self.quant_scales, "/".join((*self.path, "gates_h")))
            gates = (int8_conv(x.astype(self.dtype), kernel[:, :, :cx], bias,
                               act_scale=sx)
                     + int8_conv(h.astype(self.dtype), kernel[:, :, cx:],
                                 None, act_scale=sh)).astype(self.dtype)
        else:
            gates = nn.Conv(4 * self.features, self.kernel_size,
                            padding="SAME", kernel_init=_KERNEL_INIT,
                            dtype=self.dtype,
                            param_dtype=self.param_dtype, name="gates")(inp)
        # gate math via XLA's fusion; the fused Pallas kernel alternative
        # (ops/pallas/lstm_gates.py) measured −38% pre-d2s and −80% on the
        # shipping graph — see the ModelConfig flag graveyard
        new_h, new_c = lstm_gate_math(gates, c, self.forget_bias)
        return new_h, new_c
