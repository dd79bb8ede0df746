"""Resize op tests: the arithmetic upsample must match jax.image.resize and
the torch align_corners=False convention exactly (parity trap)."""

import jax.numpy as jnp
import numpy as np

from bin_tpu.ops.resize import downsample2x, resize_bilinear, upsample2x


def _x(seed=0, shape=(2, 7, 9, 5)):
    return jnp.asarray(np.random.default_rng(seed)
                       .normal(size=shape).astype(np.float32))


def test_upsample2x_matches_jax_image():
    x = _x()
    got = upsample2x(x)
    want = resize_bilinear(x, 14, 18)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)


def test_upsample2x_matches_torch():
    import torch
    import torch.nn.functional as F
    x = _x(1, (1, 6, 8, 3))
    got = np.asarray(upsample2x(x))
    t = torch.from_numpy(np.asarray(x)).permute(0, 3, 1, 2)
    want = (F.interpolate(t, scale_factor=2, mode="bilinear",
                          align_corners=False)
            .permute(0, 2, 3, 1).numpy())
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_upsample2x_leading_dims():
    x = _x(2, (2, 3, 4, 6, 2))  # extra leading dim
    assert upsample2x(x).shape == (2, 3, 8, 12, 2)


def test_downsample2x_is_avg_pool():
    x = _x(3, (1, 4, 6, 2))
    got = np.asarray(downsample2x(x))
    want = np.asarray(x).reshape(1, 2, 2, 3, 2, 2).mean(axis=(2, 4))
    np.testing.assert_allclose(got, want, atol=1e-6)
