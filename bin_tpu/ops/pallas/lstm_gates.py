"""Fused ConvLSTM gate update as a single Pallas VMEM pass.

The gate convolution (bin_tpu.models.convlstm) produces pre-activations for
all four gates; the remaining update
    c' = sigmoid(f + bias) * c + sigmoid(i) * tanh(g)
    h' = sigmoid(o) * tanh(c')
is a 7-op pointwise chain over 5 arrays.  Fusing it into one kernel reads
i, f, g, o, c once from HBM and writes h', c' once — the minimal traffic —
instead of trusting the XLA scheduler across the scan boundary.

Forward is the Pallas kernel; backward (custom VJP) recomputes the cheap
sigmoids in plain jnp, so training works and nothing but the primals is
saved between passes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["fused_lstm_gates"]

_TILE_ROWS = 256


def _gate_kernel(i_ref, f_ref, g_ref, o_ref, c_ref, h_out, c_out, *, bias):
    c = c_ref[:].astype(jnp.float32)
    new_c = (jax.nn.sigmoid(f_ref[:].astype(jnp.float32) + bias) * c
             + jax.nn.sigmoid(i_ref[:].astype(jnp.float32))
             * jnp.tanh(g_ref[:].astype(jnp.float32)))
    h_out[:] = jax.nn.sigmoid(o_ref[:].astype(jnp.float32)) * jnp.tanh(new_c)
    c_out[:] = new_c


def _forward(gates: jax.Array, c: jax.Array, bias: float, interpret: bool):
    feat = c.shape[-1]
    lead = c.shape[:-1]
    rows = 1
    for d in lead:
        rows *= d
    i, f, g, o = [x.reshape(rows, feat) for x in jnp.split(gates, 4, axis=-1)]
    c2 = c.reshape(rows, feat)

    tile = min(_TILE_ROWS, rows)
    grid = (pl.cdiv(rows, tile),)
    spec = pl.BlockSpec((tile, feat), lambda r: (r, 0), memory_space=pltpu.VMEM)
    h_new, c_new = pl.pallas_call(
        functools.partial(_gate_kernel, bias=bias),
        grid=grid,
        in_specs=[spec] * 5,
        out_specs=(spec, spec),
        out_shape=(jax.ShapeDtypeStruct((rows, feat), jnp.float32),
                   jax.ShapeDtypeStruct((rows, feat), jnp.float32)),
        interpret=interpret,
    )(i, f, g, o, c2)
    return h_new.reshape(lead + (feat,)), c_new.reshape(lead + (feat,))


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def fused_lstm_gates(gates: jax.Array, c: jax.Array, bias: float = 1.0,
                     interpret: bool | None = None):
    """(..., 4F) gate pre-activations + (..., F) cell → (h', c') in fp32.

    ``interpret=None`` auto-selects: compiled on TPU, interpret elsewhere
    (the kernel is TPU-only Mosaic; CPU tests run the interpreter).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    return _forward(gates, c, bias, interpret)


def _fwd(gates, c, bias, interpret):
    out = fused_lstm_gates(gates, c, bias, interpret)
    return out, (gates, c)


def _bwd(bias, interpret, res, grads):
    gates, c = res
    dh, dc_out = grads
    gates = gates.astype(jnp.float32)
    c = c.astype(jnp.float32)
    i, f, g, o = jnp.split(gates, 4, axis=-1)
    si = jax.nn.sigmoid(i)
    sf = jax.nn.sigmoid(f + bias)
    tg = jnp.tanh(g)
    new_c = sf * c + si * tg
    so = jax.nn.sigmoid(o)
    tc = jnp.tanh(new_c)
    # dL/dc' combines the direct cotangent and the one through h'
    dnew_c = dc_out + dh * so * (1.0 - tc * tc)
    di = dnew_c * tg * si * (1.0 - si)
    df = dnew_c * c * sf * (1.0 - sf)
    dg = dnew_c * si * (1.0 - tg * tg)
    do = dh * tc * so * (1.0 - so)
    dgates = jnp.concatenate([di, df, dg, do], axis=-1)
    return dgates, dnew_c * sf


fused_lstm_gates.defvjp(_fwd, _bwd)
