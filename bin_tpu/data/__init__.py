"""Data pipeline: blur synthesis, frame-folder datasets, synthetic clips.

Reference layout (SURVEY.md §4.3 [R][P]): Adobe240/GoPro videos are offline
ffmpeg-extracted to 240fps PNG frames; a blur-synthesis script averages
``taps`` (11) consecutive sharp frames with stride 8 into each blurry frame,
yielding a 30fps blurry stream with sharp ground truth at key frames and
temporal midpoints.  Time bookkeeping used throughout this package:

  blurry key frame k      = mean(sharp[k*stride : k*stride + taps])
  its sharp GT            = sharp[k*stride + (taps-1)//2]
  midpoint GT between k,k+1 = sharp[k*stride + (taps-1)//2 + stride//2]

In "output timestamp" units t (the 2x-rate output grid), key frames sit at
even t and midpoints at odd t; a clip of K key frames supervises 2K-1 sharp
timestamps.
"""

from bin_tpu.data.synthetic import make_sample, render_sharp_clip, synthesize_blur
from bin_tpu.data.pipeline import train_iterator, eval_clips

__all__ = [
    "make_sample", "render_sharp_clip", "synthesize_blur",
    "train_iterator", "eval_clips",
]
