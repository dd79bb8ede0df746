"""Native (C++) vs numpy-fallback equivalence for the host data kernels."""

import numpy as np
import pytest

from bin_tpu.data import fastops


def _frames(seed=0, shape=(30, 24, 32, 3)):
    return np.random.default_rng(seed).integers(0, 256, shape, dtype=np.uint8)


def _numpy_crop(frames, y0, x0, ch, cw, fh, fw, ft):
    out = frames[:, y0:y0 + ch, x0:x0 + cw]
    if fh:
        out = out[:, ::-1]
    if fw:
        out = out[:, :, ::-1]
    if ft:
        out = out[::-1]
    return np.ascontiguousarray(out).astype(np.float32) / 255.0


@pytest.mark.parametrize("flips", [(False, False, False), (True, False, False),
                                   (False, True, False), (True, True, True)])
def test_crop_norm_matches_numpy(flips):
    f = _frames()
    got = fastops.crop_norm_u8(f, 3, 5, 16, 20, *flips)
    want = _numpy_crop(f, 3, 5, 16, 20, *flips)
    np.testing.assert_allclose(got, want, atol=1e-7)


def test_crop_norm_bounds_check():
    if not fastops.HAVE_NATIVE:
        pytest.skip("native extension not built")
    with pytest.raises(ValueError):
        fastops.crop_norm_u8(_frames(), 20, 0, 16, 16)


def test_blur_average_matches_reference_recipe():
    f = _frames(1, (51, 16, 16, 3))
    got = fastops.blur_average_u8(f, 11, 8)
    assert got.shape == (6, 16, 16, 3)
    for k in range(6):
        want = f[k * 8: k * 8 + 11].astype(np.float64).mean(axis=0) / 255.0
        np.testing.assert_allclose(got[k], want, atol=1e-5)


def test_blur_average_large_stride_disjoint_windows():
    f = _frames(2, (40, 8, 8, 3))
    got = fastops.blur_average_u8(f, 3, 17)  # windows don't overlap
    assert got.shape == (3, 8, 8, 3)
    for k in range(3):
        want = f[k * 17: k * 17 + 3].astype(np.float64).mean(axis=0) / 255.0
        np.testing.assert_allclose(got[k], want, atol=1e-5)


def test_native_extension_built():
    """The build image has a full toolchain — the extension must exist."""
    assert fastops.HAVE_NATIVE
