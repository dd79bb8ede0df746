"""Host data-path kernels: native (bin_tpu._fastops, C++) with numpy
fallbacks.

See _native/fastops.cpp for why these exist (single-core host feeding a
TPU).  Both implementations are equivalence-tested against each other
(tests/test_fastops.py); callers use this module and never import the
extension directly.
"""

from __future__ import annotations

import numpy as np

try:
    from bin_tpu import _fastops as _ext
except ImportError:  # extension not built — pure-python fallback
    _ext = None

__all__ = ["HAVE_NATIVE", "crop_norm_u8", "blur_average_u8"]

HAVE_NATIVE = _ext is not None


def crop_norm_u8(frames: np.ndarray, y0: int, x0: int, ch: int, cw: int,
                 flip_h: bool = False, flip_w: bool = False,
                 flip_t: bool = False) -> np.ndarray:
    """uint8 (T,H,W,3) → float32 (T,ch,cw,3) in [0,1]: fused crop + flips +
    normalize (one pass in native mode)."""
    if _ext is not None:
        return _ext.crop_norm_u8(np.ascontiguousarray(frames), y0, x0, ch, cw,
                                 bool(flip_h), bool(flip_w), bool(flip_t))
    out = frames[:, y0:y0 + ch, x0:x0 + cw]
    if flip_h:
        out = out[:, ::-1]
    if flip_w:
        out = out[:, :, ::-1]
    if flip_t:
        out = out[::-1]
    return np.ascontiguousarray(out).astype(np.float32) / np.float32(255.0)


def blur_average_u8(frames: np.ndarray, taps: int = 11,
                    stride: int = 8) -> np.ndarray:
    """uint8 (T,H,W,C) sharp stream → float32 (K,H,W,C) blurry frames in
    [0,1] (running-window mean — the reference blur recipe, SURVEY.md §4.3)."""
    if _ext is not None:
        return _ext.blur_average_u8(np.ascontiguousarray(frames), taps, stride)
    t = frames.shape[0]
    k = (t - taps) // stride + 1
    if k <= 0:
        raise ValueError("clip shorter than taps")
    cumsum = np.concatenate([
        np.zeros((1,) + frames.shape[1:], np.float32),
        np.cumsum(frames, axis=0, dtype=np.float32)])
    starts = np.arange(k) * stride
    return (cumsum[starts + taps] - cumsum[starts]) / np.float32(taps * 255.0)
