"""JAX-native image quality metrics: PSNR and SSIM.

The reference computes PSNR/SSIM per frame on CPU/numpy after a device→host
copy (SURVEY.md §4.2 [R]); here both metrics are pure jittable JAX so
evaluation stays on-device and the per-frame loop fuses under ``vmap``.

SSIM definitional parity (SURVEY.md §8 "parity trap (b)") — this implements
the standard Wang et al. 2004 configuration used by the video deblur/interp
literature and by ``skimage.metrics.structural_similarity`` with
``gaussian_weights=True, sigma=1.5, use_sample_covariance=False``:

  * 11x11 Gaussian window, sigma = 1.5 (truncated at the window edge,
    normalized to sum 1)
  * K1 = 0.01, K2 = 0.03 on data_range = 1.0 (images in [0, 1])
  * covariance normalized by N (not N-1)
  * computed per channel then averaged; no edge cropping beyond the valid
    convolution region

All functions take images shaped (..., H, W, C) in [0, 1].
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["psnr", "ssim", "gaussian_kernel"]


def psnr(pred: jax.Array, target: jax.Array, max_val: float = 1.0) -> jax.Array:
    """Peak signal-to-noise ratio over the trailing (H, W, C) dims, in dB."""
    pred = pred.astype(jnp.float32)
    target = target.astype(jnp.float32)
    mse = jnp.mean(jnp.square(pred - target), axis=(-3, -2, -1))
    mse = jnp.maximum(mse, 1e-12)  # avoid -inf on identical images
    return 10.0 * jnp.log10(max_val * max_val / mse)


@functools.lru_cache(maxsize=8)
def gaussian_kernel(size: int = 11, sigma: float = 1.5) -> np.ndarray:
    """1-D Gaussian window, normalized to sum to 1 (separable SSIM filter)."""
    offsets = np.arange(size, dtype=np.float64) - (size - 1) / 2.0
    g = np.exp(-0.5 * (offsets / sigma) ** 2)
    return (g / g.sum()).astype(np.float32)


def _filter2d_separable(x: jax.Array, window: np.ndarray) -> jax.Array:
    """Valid-mode separable 2-D filtering over (N, H, W, C).

    precision=HIGHEST is load-bearing: at DEFAULT precision XLA runs fp32
    convs through bf16 passes, the window effectively loses ~8e-4 of its
    mass, variances go negative by ~4e-3, and SSIM comes out >1 (observed
    1.08 on smooth frames).  Metrics must not depend on the global
    jax_default_matmul_precision setting."""
    c = x.shape[-1]
    size = window.shape[0]
    kh = jnp.asarray(window).reshape(size, 1, 1, 1) * jnp.ones((1, 1, 1, c))
    kw = jnp.asarray(window).reshape(1, size, 1, 1) * jnp.ones((1, 1, 1, c))
    dn = jax.lax.conv_dimension_numbers(x.shape, kh.shape, ("NHWC", "HWIO", "NHWC"))
    x = jax.lax.conv_general_dilated(x, kh, (1, 1), "VALID",
                                     dimension_numbers=dn, feature_group_count=c,
                                     precision=jax.lax.Precision.HIGHEST)
    x = jax.lax.conv_general_dilated(x, kw, (1, 1), "VALID",
                                     dimension_numbers=dn, feature_group_count=c,
                                     precision=jax.lax.Precision.HIGHEST)
    return x


def ssim(pred: jax.Array, target: jax.Array, max_val: float = 1.0,
         window_size: int = 11, sigma: float = 1.5,
         k1: float = 0.01, k2: float = 0.03) -> jax.Array:
    """Mean SSIM over the trailing (H, W, C) dims.

    Accepts (..., H, W, C); returns shape (...,). Uses fp32 internally
    regardless of input dtype (the 0.05 dB parity budget does not tolerate
    bf16 metric noise).
    """
    if pred.shape[-3] < window_size or pred.shape[-2] < window_size:
        # the VALID-windowed maps would be empty and the mean silently NaN
        # (found by hypothesis, tests/test_properties.py)
        raise ValueError(
            f"ssim needs H, W >= window_size ({window_size}); got "
            f"{pred.shape[-3]}x{pred.shape[-2]}")
    pred = pred.astype(jnp.float32)
    target = target.astype(jnp.float32)
    batch_shape = pred.shape[:-3]
    x = pred.reshape((-1,) + pred.shape[-3:])
    y = target.reshape((-1,) + target.shape[-3:])

    window = gaussian_kernel(window_size, sigma)
    c1 = (k1 * max_val) ** 2
    c2 = (k2 * max_val) ** 2

    mu_x = _filter2d_separable(x, window)
    mu_y = _filter2d_separable(y, window)
    mu_xx = mu_x * mu_x
    mu_yy = mu_y * mu_y
    mu_xy = mu_x * mu_y
    # E[x^2] - E[x]^2 with N (not N-1) normalization: matches
    # use_sample_covariance=False in skimage.
    sigma_xx = _filter2d_separable(x * x, window) - mu_xx
    sigma_yy = _filter2d_separable(y * y, window) - mu_yy
    sigma_xy = _filter2d_separable(x * y, window) - mu_xy

    num = (2.0 * mu_xy + c1) * (2.0 * sigma_xy + c2)
    den = (mu_xx + mu_yy + c1) * (sigma_xx + sigma_yy + c2)
    ssim_map = num / den
    out = jnp.mean(ssim_map, axis=(1, 2, 3))
    return out.reshape(batch_shape)
