"""Property-based tests (hypothesis) + jit/no-jit variants (chex) — the
test-strategy layer SURVEY.md §5 planned: shape/dtype/value invariants over
randomized inputs instead of hand-picked examples.

Examples are kept small (CPU host); the properties are exact mathematical
contracts of the ops, so few examples over wide strategies beat many over
narrow ones."""

import chex
import jax
import jax.numpy as jnp
import numpy as np
from hypothesis import given, settings, strategies as st

from bin_tpu.losses import charbonnier
from bin_tpu.metrics import psnr, ssim
from bin_tpu.ops.quant import fake_quant, quantize_symmetric
from bin_tpu.ops.pixel_shuffle import depth_to_space, space_to_depth

SETTINGS = dict(max_examples=20, deadline=None)


def _imgs(draw, h, w, n=2):
    arrs = draw(st.lists(
        st.integers(0, 2**32 - 1), min_size=n, max_size=n)).copy()
    return [np.random.default_rng(s).uniform(0, 1, (1, h, w, 3))
            .astype(np.float32) for s in arrs]


def test_ssim_rejects_sub_window_images():
    """Hypothesis-found edge: images smaller than the SSIM window used to
    return silent NaN (empty VALID maps); now a clear trace-time error."""
    import pytest
    a = jnp.zeros((1, 8, 8, 3))
    with pytest.raises(ValueError, match="window_size"):
        ssim(a, a)


@settings(**SETTINGS)
@given(st.data(), st.integers(11, 24), st.integers(11, 24))
def test_metric_invariants(data, h, w):
    a, b = _imgs(data.draw, h, w)
    a, b = jnp.asarray(a), jnp.asarray(b)
    # identity: ssim(x,x) == 1 exactly up to fp; psnr(x,x) is huge/inf
    np.testing.assert_allclose(np.asarray(ssim(a, a)), 1.0, atol=1e-5)
    assert float(psnr(a, a).min()) > 60.0
    # symmetry of both metrics
    np.testing.assert_allclose(np.asarray(psnr(a, b)),
                               np.asarray(psnr(b, a)), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(ssim(a, b)),
                               np.asarray(ssim(b, a)), rtol=1e-4, atol=1e-5)
    # range: ssim in [-1, 1]
    s = np.asarray(ssim(a, b))
    assert (s <= 1.0 + 1e-6).all() and (s >= -1.0 - 1e-6).all()


@settings(**SETTINGS)
@given(st.data(), st.integers(8, 20), st.integers(8, 20))
def test_charbonnier_invariants(data, h, w):
    a, b = _imgs(data.draw, h, w)
    a, b = jnp.asarray(a), jnp.asarray(b)
    # nonnegative; near-zero at equality (bounded by eps); symmetric
    assert float(charbonnier(a, b)) >= 0.0
    assert float(charbonnier(a, a)) <= 2e-3
    np.testing.assert_allclose(float(charbonnier(a, b)),
                               float(charbonnier(b, a)), rtol=1e-6)


@settings(**SETTINGS)
@given(st.data(), st.integers(1, 6), st.integers(1, 6), st.integers(1, 16),
       st.booleans())
def test_quantize_symmetric_bounds(data, h, w, c, per_channel):
    x = np.random.default_rng(data.draw(st.integers(0, 2**32 - 1))).normal(
        0, data.draw(st.floats(1e-3, 10.0)), (2, h, w, c)).astype(np.float32)
    q, s = quantize_symmetric(jnp.asarray(x),
                              axis=(0, 1, 2) if per_channel else None)
    q, s = np.asarray(q, np.float32), np.asarray(s)
    assert (np.abs(q) <= 127).all() and (s > 0).all()
    # quantization error bounded by half a step everywhere
    assert (np.abs(q * s - x) <= s / 2 + 1e-7).all()


@settings(**SETTINGS)
@given(st.data(), st.integers(2, 8), st.integers(1, 12))
def test_fake_quant_idempotent_and_max_preserving(data, hw, c):
    x = np.random.default_rng(data.draw(st.integers(0, 2**32 - 1))).normal(
        0, 1, (hw, hw, c)).astype(np.float32)
    y = np.asarray(fake_quant(jnp.asarray(x)))
    # the abs-max element maps to exactly 127 * scale = amax, so the scale
    # is preserved and a second pass is exact
    np.testing.assert_allclose(np.abs(y).max(), np.abs(x).max(), rtol=1e-6)
    y2 = np.asarray(fake_quant(jnp.asarray(y)))
    np.testing.assert_array_equal(y, y2)


@settings(**SETTINGS)
@given(st.data(), st.sampled_from([1, 2, 4]), st.integers(1, 4),
       st.integers(1, 4))
def test_space_depth_roundtrip(data, f, hb, wb):
    x = np.random.default_rng(data.draw(st.integers(0, 2**32 - 1))).uniform(
        0, 1, (2, hb * f, wb * f, 3)).astype(np.float32)
    packed = space_to_depth(jnp.asarray(x), f)
    assert packed.shape == (2, hb, wb, 3 * f * f)
    np.testing.assert_array_equal(np.asarray(depth_to_space(packed, f)), x)


def test_metrics_jit_eager_consistency():
    """psnr/ssim bit-agree under jit and eager (chex tree asserts); their
    output shapes follow the (B,) per-clip contract (chex shape asserts)."""
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.uniform(0, 1, (2, 24, 24, 3)).astype(np.float32))
    b = jnp.asarray(rng.uniform(0, 1, (2, 24, 24, 3)).astype(np.float32))

    def both(x, y):
        return psnr(x, y), ssim(x, y)

    eager = both(a, b)
    jitted = jax.jit(both)(a, b)
    chex.assert_trees_all_close(eager, jitted, rtol=1e-6)
    chex.assert_shape(eager[0], (2,))
    chex.assert_shape(eager[1], (2,))
    chex.assert_tree_all_finite(eager)
