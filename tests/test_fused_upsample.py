"""The fused phase-bank upsample-conv must equal the unfused composition
``conv3x3_replicate(upsample2x(x)) + bias`` to fp32 associativity everywhere
— interior AND all border lines/corners (ops/fused_upsample.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from bin_tpu.ops.fused_upsample import (upsample2x_conv,
                                        upsample2x_conv_reference)


@pytest.mark.parametrize("n,m", [(1, 1), (1, 4), (2, 2), (2, 5), (3, 3),
                                 (5, 2), (7, 9), (16, 16)])
@pytest.mark.parametrize("cin,cout", [(4, 8), (8, 4)])
def test_fused_equals_reference(n, m, cin, cout):
    rng = np.random.default_rng(n * 100 + m * 10 + cin)
    x = jnp.asarray(rng.normal(size=(2, n, m, cin)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(3, 3, cin, cout)).astype(np.float32) * 0.2)
    b = jnp.asarray(rng.normal(size=(cout,)).astype(np.float32))
    got = np.asarray(upsample2x_conv(x, k, b))
    want = np.asarray(upsample2x_conv_reference(x, k, b))
    assert got.shape == (2, 2 * n, 2 * m, cout)
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-5)


def test_gradients_match_reference():
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(1, 5, 6, 4)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(3, 3, 4, 4)).astype(np.float32) * 0.2)
    b = jnp.asarray(rng.normal(size=(4,)).astype(np.float32))

    def loss_fused(x, k, b):
        return jnp.sum(jnp.sin(upsample2x_conv(x, k, b)))

    def loss_ref(x, k, b):
        return jnp.sum(jnp.sin(upsample2x_conv_reference(x, k, b)))

    gf = jax.grad(loss_fused, argnums=(0, 1, 2))(x, k, b)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(x, k, b)
    for a, c in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                   atol=5e-5, rtol=1e-4)


def test_upsample_module_fused_vs_unfused():
    from bin_tpu.models.layers import Upsample
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.normal(size=(2, 6, 8, 8)).astype(np.float32))
    fused = Upsample(features=16)
    params = fused.init(jax.random.key(0), x)
    unfused = Upsample(features=16, fused=False)
    np.testing.assert_allclose(
        np.asarray(fused.apply(params, x)),
        np.asarray(unfused.apply(params, x)), atol=2e-5, rtol=1e-5)
