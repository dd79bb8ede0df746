"""Synthetic blurry/sharp clip generator.

The build machine has no Adobe240/GoPro data and no network (SURVEY.md §8
hard part (f)), so all correctness and quality work runs on procedurally
generated clips: smoothly moving Gaussian blobs over a drifting background
gradient, rendered at "240fps" sub-frame resolution, then blurred with the
exact averaging recipe the reference uses offline (mean of ``taps``
consecutive frames, stride ``stride`` — SURVEY.md §4.3).

Determinism: everything derives from an integer seed via
``np.random.Generator(np.random.Philox(seed))`` so loaders are reproducible
across processes (Grain-style determinism, SURVEY.md §6.2).
"""

from __future__ import annotations

import numpy as np

__all__ = ["render_sharp_clip", "synthesize_blur", "make_sample", "num_sharp_needed"]


def num_sharp_needed(num_keys: int, taps: int = 11, stride: int = 8) -> int:
    """Sharp 240fps frames required to synthesize ``num_keys`` blurry frames."""
    return (num_keys - 1) * stride + taps


def render_sharp_clip(seed: int, num_frames: int, height: int, width: int,
                      num_blobs: int = 8) -> np.ndarray:
    """Render (T, H, W, 3) float32 frames in [0, 1] of moving Gaussian blobs.

    Motion is linear in time with per-blob velocity of a few pixels per
    240fps frame, so an 11-tap average produces realistic motion blur streaks.
    """
    rng = np.random.Generator(np.random.Philox(seed))
    ys, xs = np.mgrid[0:height, 0:width].astype(np.float32)

    # Background: static low-frequency color gradient + slow global drift.
    freq_y = rng.uniform(0.5, 2.0, size=3).astype(np.float32)
    freq_x = rng.uniform(0.5, 2.0, size=3).astype(np.float32)
    phase = rng.uniform(0, 2 * np.pi, size=3).astype(np.float32)
    drift = rng.uniform(-0.02, 0.02, size=3).astype(np.float32)

    # Blobs: position, velocity, radius, per-channel amplitude.
    pos = rng.uniform([0, 0], [height, width], size=(num_blobs, 2)).astype(np.float32)
    vel = rng.uniform(-3.0, 3.0, size=(num_blobs, 2)).astype(np.float32)
    radius = rng.uniform(min(height, width) * 0.05,
                         min(height, width) * 0.2, size=num_blobs).astype(np.float32)
    amp = rng.uniform(-0.6, 0.6, size=(num_blobs, 3)).astype(np.float32)

    frames = np.empty((num_frames, height, width, 3), dtype=np.float32)
    for t in range(num_frames):
        img = np.empty((height, width, 3), dtype=np.float32)
        for c in range(3):
            img[..., c] = 0.5 + 0.2 * np.sin(
                2 * np.pi * (freq_y[c] * ys / height + freq_x[c] * xs / width)
                + phase[c] + drift[c] * t)
        p = pos + vel * t
        # wrap blob centres so they stay in frame over long clips
        p[:, 0] = np.mod(p[:, 0], height)
        p[:, 1] = np.mod(p[:, 1], width)
        for b in range(num_blobs):
            d2 = (ys - p[b, 0]) ** 2 + (xs - p[b, 1]) ** 2
            g = np.exp(-0.5 * d2 / (radius[b] ** 2))
            img += g[..., None] * amp[b]
        np.clip(img, 0.0, 1.0, out=img)
        frames[t] = img
    return frames


def synthesize_blur(sharp: np.ndarray, taps: int = 11, stride: int = 8) -> np.ndarray:
    """Average ``taps`` consecutive sharp frames with ``stride`` → blurry frames.

    Matches the reference's offline blur-synthesis recipe (SURVEY.md §4.3):
    blurry[k] = mean(sharp[k*stride : k*stride + taps]).
    """
    t = sharp.shape[0]
    num_keys = (t - taps) // stride + 1
    if num_keys <= 0:
        raise ValueError(f"clip of {t} frames too short for taps={taps}")
    cumsum = np.concatenate([np.zeros_like(sharp[:1]),
                             np.cumsum(sharp, axis=0, dtype=np.float32)])
    starts = np.arange(num_keys) * stride
    return (cumsum[starts + taps] - cumsum[starts]) / np.float32(taps)


def gt_indices(num_keys: int, taps: int = 11, stride: int = 8) -> np.ndarray:
    """240fps indices of the 2K-1 supervised sharp timestamps for K keys.

    Key-frame centers sit at ``center + k*stride``; interpolated GT frames
    sit at the true temporal midpoints between consecutive centers. Odd
    strides would put midpoints off the integer 240fps grid (and silently
    misalign supervision with the blurry keys), so they are rejected.
    """
    if stride % 2 != 0:
        raise ValueError(
            f"blur stride must be even so interpolation midpoints land on "
            f"the 240fps frame grid; got stride={stride}")
    center = (taps - 1) // 2
    return center + np.arange(2 * num_keys - 1) * (stride // 2)


def make_sample(seed: int, num_keys: int, height: int, width: int,
                taps: int = 11, stride: int = 8) -> dict[str, np.ndarray]:
    """One training/eval sample.

    Returns
      blurry: (K, H, W, 3)      blurry key frames (model input)
      sharp:  (2K-1, H, W, 3)   sharp GT on the 2x output grid
    """
    total = num_sharp_needed(num_keys, taps, stride)
    clip = render_sharp_clip(seed, total, height, width)
    blurry = synthesize_blur(clip, taps, stride)
    sharp = clip[gt_indices(num_keys, taps, stride)]
    return {"blurry": blurry, "sharp": sharp}
