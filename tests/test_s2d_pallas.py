"""Pallas input-pack kernel (ops/pallas/s2d_pack.py): bit-exactness vs the
reshape/transpose reference, across factors, dtypes, and lead shapes; plus
gradient flow (custom VJP = inverse permutation) and model wiring.

CPU runs the interpreter (the kernel is TPU Mosaic); the on-chip fps A/B
is recorded in BASELINE.md alongside s2d_via_conv / use_pallas_lstm.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from bin_tpu.ops.pallas.s2d_pack import space_to_depth_pallas
from bin_tpu.ops.pixel_shuffle import input_pack_fn, space_to_depth


@pytest.mark.parametrize("factor", [2, 4])
@pytest.mark.parametrize("dtype", ["float32", "bfloat16", "uint8"])
def test_bit_exact_vs_reference(factor, dtype):
    rng = np.random.default_rng(0)
    x = rng.uniform(0, 255, (2, 3, 16, 24, 3))
    x = jnp.asarray(x, dtype=jnp.dtype(dtype))
    ref = space_to_depth(x, factor)
    out = space_to_depth_pallas(x, factor, interpret=True)
    assert out.shape == ref.shape and out.dtype == ref.dtype
    assert (np.asarray(out) == np.asarray(ref)).all()  # permutation: exact


def test_odd_tile_rows():
    # per-image output rows (Ho=9) not divisible by the preferred tile:
    # _rows_tile must fall back to a divisor and blocks must not straddle
    # image boundaries
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(3, 18, 8, 3)), jnp.float32)
    ref = space_to_depth(x, 2)
    out = space_to_depth_pallas(x, 2, interpret=True)
    assert (np.asarray(out) == np.asarray(ref)).all()


def test_factor_one_identity_and_divisibility():
    x = jnp.ones((1, 8, 8, 3))
    assert space_to_depth_pallas(x, 1) is x
    with pytest.raises(ValueError):
        space_to_depth_pallas(x, 3)


def test_gradient_is_inverse_permutation():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(1, 8, 12, 3)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(4, 6, 12)), jnp.float32)

    def loss_pallas(x):
        return jnp.sum(space_to_depth_pallas(x, 2, True) * w)

    def loss_ref(x):
        return jnp.sum(space_to_depth(x, 2) * w)

    g_pallas = jax.grad(loss_pallas)(x)
    g_ref = jax.grad(loss_ref)(x)
    assert (np.asarray(g_pallas) == np.asarray(g_ref)).all()


def test_input_pack_fn_dispatch():
    from bin_tpu.config import get_config
    from bin_tpu.ops.pixel_shuffle import space_to_depth_conv

    cfg = get_config("config3_prf").model
    assert input_pack_fn(cfg) is space_to_depth
    cfg2 = get_config("config3_prf", ["model.s2d_via_conv=true"]).model
    assert input_pack_fn(cfg2) is space_to_depth_conv

