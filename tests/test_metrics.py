"""PSNR/SSIM definitional tests (SURVEY.md §8 parity trap (b)).

SSIM is validated against skimage.metrics.structural_similarity with
gaussian_weights=True, sigma=1.5, use_sample_covariance=False — the standard
configuration of the deblur/interp literature.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from bin_tpu import metrics


def _rand_pair(seed, shape=(1, 64, 64, 3), noise=0.05):
    rng = np.random.Generator(np.random.Philox(seed))
    x = rng.uniform(0, 1, size=shape).astype(np.float32)
    y = np.clip(x + rng.normal(0, noise, size=shape).astype(np.float32), 0, 1)
    return x, y


def test_psnr_known_value():
    x = np.zeros((1, 8, 8, 3), np.float32)
    y = np.full_like(x, 0.1)
    # MSE = 0.01 → PSNR = 10*log10(1/0.01) = 20 dB
    np.testing.assert_allclose(np.asarray(metrics.psnr(x, y)), 20.0, atol=1e-4)


def test_psnr_identical_finite():
    x = np.random.default_rng(0).uniform(0, 1, (2, 16, 16, 3)).astype(np.float32)
    assert np.all(np.isfinite(np.asarray(metrics.psnr(x, x))))


def test_psnr_batch_shape():
    x, y = _rand_pair(1, shape=(4, 5, 32, 32, 3))
    assert metrics.psnr(x, y).shape == (4, 5)


def test_ssim_identical_is_one():
    x, _ = _rand_pair(2)
    np.testing.assert_allclose(np.asarray(metrics.ssim(x, x)), 1.0, atol=1e-5)


def test_ssim_batch_shape_and_range():
    x, y = _rand_pair(3, shape=(2, 3, 48, 48, 3))
    s = np.asarray(metrics.ssim(x, y))
    assert s.shape == (2, 3)
    assert np.all(s > 0.0) and np.all(s <= 1.0)


def test_ssim_matches_skimage():
    skimage = pytest.importorskip("skimage.metrics")
    x, y = _rand_pair(4, shape=(1, 64, 64, 3), noise=0.08)
    ours = float(np.asarray(metrics.ssim(x, y))[0])
    ref = skimage.structural_similarity(
        x[0], y[0], channel_axis=-1, data_range=1.0,
        gaussian_weights=True, sigma=1.5, use_sample_covariance=False)
    # skimage averages over the full padded map; we average the valid region
    # only, so allow a small tolerance.
    assert abs(ours - ref) < 5e-3, (ours, ref)


def test_ssim_gaussian_window_normalized():
    w = metrics.gaussian_kernel(11, 1.5)
    assert w.shape == (11,)
    np.testing.assert_allclose(w.sum(), 1.0, atol=1e-6)
    assert w[5] == w.max()  # centered


def test_ssim_robust_to_default_matmul_precision():
    """SSIM must not depend on jax_default_matmul_precision: at 'default',
    XLA runs fp32 convs through bf16 and an unpinned filter loses ~8e-4 of
    window mass → variance goes negative → SSIM > 1 (observed 1.08)."""
    import jax
    old = jax.config.jax_default_matmul_precision
    try:
        jax.config.update("jax_default_matmul_precision", "default")
        # smooth, highly-correlated pair (the worst case for cancellation)
        ys, xs = np.mgrid[0:64, 0:64].astype(np.float32) / 64.0
        base = 0.5 + 0.2 * np.sin(2 * np.pi * (ys + xs))
        x = np.repeat(base[None, :, :, None], 3, axis=-1)
        y = np.clip(x + np.random.default_rng(0).normal(
            0, 0.003, x.shape).astype(np.float32), 0, 1)
        s = float(np.asarray(metrics.ssim(x, y)).mean())
        assert s <= 1.0 + 1e-5, s
        assert s > 0.9
    finally:
        jax.config.update("jax_default_matmul_precision", old)


def test_metrics_jittable():
    import jax
    x, y = _rand_pair(5)
    p = jax.jit(metrics.psnr)(jnp.asarray(x), jnp.asarray(y))
    s = jax.jit(metrics.ssim)(jnp.asarray(x), jnp.asarray(y))
    assert np.isfinite(float(p[0])) and np.isfinite(float(s[0]))
