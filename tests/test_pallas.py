"""Pallas kernel tests (interpret mode on CPU) against jnp reference math."""

import jax
import jax.numpy as jnp
import numpy as np

from bin_tpu.models.convlstm import lstm_gate_math
from bin_tpu.ops.pallas.lstm_gates import fused_lstm_gates


def _inputs(seed=0, shape=(2, 8, 8), feat=16):
    rng = np.random.default_rng(seed)
    gates = jnp.asarray(rng.normal(0, 2, shape + (4 * feat,)).astype(np.float32))
    c = jnp.asarray(rng.normal(0, 1, shape + (feat,)).astype(np.float32))
    return gates, c


def test_fused_gates_matches_reference():
    gates, c = _inputs()
    h_ref, c_ref = lstm_gate_math(gates, c, forget_bias=1.0)
    h_k, c_k = fused_lstm_gates(gates, c, 1.0, True)
    np.testing.assert_allclose(np.asarray(h_k), np.asarray(h_ref), atol=1e-6)
    np.testing.assert_allclose(np.asarray(c_k), np.asarray(c_ref), atol=1e-6)


def test_fused_gates_bf16_inputs():
    gates, c = _inputs(1)
    h_k, c_k = fused_lstm_gates(gates.astype(jnp.bfloat16),
                                c.astype(jnp.bfloat16), 1.0, True)
    h_ref, _ = lstm_gate_math(gates.astype(jnp.bfloat16),
                              c.astype(jnp.bfloat16), 1.0)
    assert h_k.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(h_k), np.asarray(h_ref), atol=1e-2)


def test_fused_gates_custom_vjp_matches_autodiff():
    gates, c = _inputs(2, shape=(1, 4, 4), feat=8)

    def loss_fused(g, c_):
        h, nc = fused_lstm_gates(g, c_, 1.0, True)
        return jnp.sum(h ** 2) + jnp.sum(jnp.sin(nc))

    def loss_ref(g, c_):
        h, nc = lstm_gate_math(g, c_, 1.0)
        return jnp.sum(h ** 2) + jnp.sum(jnp.sin(nc))

    gg_k, gc_k = jax.grad(loss_fused, argnums=(0, 1))(gates, c)
    gg_r, gc_r = jax.grad(loss_ref, argnums=(0, 1))(gates, c)
    np.testing.assert_allclose(np.asarray(gg_k), np.asarray(gg_r), atol=1e-5)
    np.testing.assert_allclose(np.asarray(gc_k), np.asarray(gc_r), atol=1e-5)

