"""Frame-folder datasets: the Adobe240/GoPro on-disk layout.

Reference (SURVEY.md §3.2 'Adobe240/GoPro dataset' [R][P]): pre-extracted
PNG frame folders indexed into sliding windows of blurry key frames with
sharp GT at keys + midpoints.  Expected tree (produced by
``bin-tpu-prep`` / bin_tpu.data.blur from raw 240fps frames):

    root/
      blurry/<clip_id>/000000.png   # 30fps blurry key frames
      sharp/<clip_id>/000000.png    # 2x-rate sharp GT (2*keys-1 frames,
                                    # index t = key*2 or midpoint odd t)

``.npy`` frames (H, W, 3 uint8 or float32) are also accepted and preferred
on this 1-CPU-core host (no PNG decode in the hot path — SURVEY.md §8 hard
part (e)).
"""

from __future__ import annotations

import os
from functools import lru_cache

import numpy as np

__all__ = ["FrameFolderSource", "list_clips", "load_frame", "read_clip_list"]

_EXTS = (".npy", ".png", ".jpg", ".jpeg", ".bmp")


def read_clip_list(path: str) -> list[str]:
    """Read a sequence list file: one clip id per line, '#' comments and
    blank lines skipped, order preserved.

    The reference indexes its Adobe240/GoPro clips through such train/test
    list files rather than scanning the folder tree (SURVEY.md §3.2
    'Adobe240 dataset' [R]) — reproducing the standard split exactly, not
    just the standard layout."""
    with open(path) as f:
        ids = [line.split("#", 1)[0].strip() for line in f]
    ids = [i for i in ids if i]
    if not ids:
        raise ValueError(f"clip list {path} is empty")
    dupes = {i for i in ids if ids.count(i) > 1}
    if dupes:
        raise ValueError(f"clip list {path} has duplicates: {sorted(dupes)}")
    return ids


def list_clips(root: str, split: str) -> dict[str, list[str]]:
    """clip_id → ordered frame paths under root/<split>/<clip_id>/."""
    base = os.path.join(root, split)
    if not os.path.isdir(base):
        raise FileNotFoundError(f"dataset folder missing: {base}")
    clips = {}
    for clip_id in sorted(os.listdir(base)):
        d = os.path.join(base, clip_id)
        if not os.path.isdir(d):
            continue
        frames = sorted(f for f in os.listdir(d) if f.lower().endswith(_EXTS))
        if frames:
            clips[clip_id] = [os.path.join(d, f) for f in frames]
    if not clips:
        raise FileNotFoundError(f"no clips with frames under {base}")
    return clips


def load_frame(path: str) -> np.ndarray:
    """Load one frame as (H, W, 3) float32 in [0, 1]."""
    arr = load_frame_u8(path, allow_float=True)
    if arr.dtype == np.uint8:
        arr = arr.astype(np.float32) / 255.0
    return np.ascontiguousarray(arr.astype(np.float32))


def load_frame_u8(path: str, allow_float: bool = False) -> np.ndarray:
    """Load one frame as (H, W, 3) uint8 (native crop path)."""
    if path.endswith(".npy"):
        arr = np.load(path)
    else:
        from PIL import Image
        arr = np.asarray(Image.open(path).convert("RGB"))
    if arr.dtype != np.uint8 and not allow_float:
        arr = (np.clip(arr, 0.0, 1.0) * 255.0 + 0.5).astype(np.uint8)
    return np.ascontiguousarray(arr)


class FrameFolderSource:
    """Sliding-chunk sample source over a blurry/sharp folder tree.

    Each sample is ``num_keys`` consecutive blurry key frames plus their
    2*num_keys-1 sharp GT frames.  ``chunk_stride`` (in key frames) controls
    sample overlap; eval uses one whole-clip sample per clip
    (num_keys=None → full clips).
    """

    def __init__(self, root: str, num_keys: int | None = 4,
                 chunk_stride: int = 2, cache_frames: bool = False,
                 resize_to: tuple[int, int] | None = None,
                 raw_u8: bool = False, clip_list: str = ""):
        """``resize_to=(H, W)``: bilinear-resize frames on load — the
        Adobe240 protocol evaluates at 640x352 (half resolution) [P].
        ``raw_u8``: return uint8 frames (train path: the pipeline's fused
        native crop+normalize consumes them; incompatible with resize_to).
        ``clip_list``: path to a sequence list file restricting (and
        ordering) the clips — the standard-split mechanism; every listed
        clip must exist on disk."""
        self.blurry = list_clips(root, "blurry")
        self.sharp = list_clips(root, "sharp")
        if clip_list:
            ids = read_clip_list(clip_list)
            absent = [i for i in ids if i not in self.blurry]
            if absent:
                raise ValueError(
                    f"clip list {clip_list} names clips missing on disk: "
                    f"{absent[:5]} (have: {sorted(self.blurry)[:5]}...)")
            self.blurry = {i: self.blurry[i] for i in ids}
            self.sharp = {i: self.sharp[i] for i in ids if i in self.sharp}
        self.resize_to = resize_to
        self.raw_u8 = raw_u8
        if raw_u8 and resize_to is not None:
            raise ValueError("raw_u8 and resize_to are mutually exclusive")
        missing = set(self.blurry) ^ set(self.sharp)
        if missing:
            raise ValueError(f"blurry/sharp clip mismatch: {sorted(missing)[:5]}")
        self.num_keys = num_keys
        self._load = lru_cache(maxsize=2048)(load_frame) if cache_frames else load_frame

        self.index: list[tuple[str, int, int]] = []  # (clip, key_start, keys)
        for clip_id, frames in self.blurry.items():
            n_keys = len(frames)
            n_sharp = len(self.sharp[clip_id])
            # tolerate clips whose sharp track is shorter than 2K-1 frames
            # by shrinking the usable key range
            usable = min(n_keys, (n_sharp + 1) // 2)
            if num_keys is None:
                if usable >= 2:
                    self.index.append((clip_id, 0, usable))
            else:
                for start in range(0, usable - num_keys + 1, chunk_stride):
                    self.index.append((clip_id, start, num_keys))
        if not self.index:
            raise ValueError(
                f"no usable samples (num_keys={num_keys}) under {root}")

    def __len__(self) -> int:
        return len(self.index)

    def _load_maybe_resize(self, path: str) -> np.ndarray:
        if self.raw_u8:
            return load_frame_u8(path)
        frame = self._load(path)
        if self.resize_to is not None and frame.shape[:2] != self.resize_to:
            from PIL import Image
            h, w = self.resize_to
            # Resize in float32 (PIL mode 'F' per channel) — same
            # antialiased triangle filter as uint8 BILINEAR but without a
            # second 8-bit quantization, which matters for float .npy
            # sources in the eval protocol path.
            frame = np.stack(
                [np.asarray(Image.fromarray(frame[..., c], mode="F")
                            .resize((w, h), Image.BILINEAR))
                 for c in range(frame.shape[-1])], axis=-1).astype(np.float32)
        return frame

    def sample_name(self, i: int) -> str:
        """Clip identity for eval tables (the reference's per-video rows)."""
        clip_id, start, _keys = self.index[i]
        return clip_id if start == 0 else f"{clip_id}@{start}"

    def __getitem__(self, i: int) -> dict[str, np.ndarray]:
        clip_id, start, keys = self.index[i]
        b_paths = self.blurry[clip_id][start: start + keys]
        s_paths = self.sharp[clip_id][2 * start: 2 * start + 2 * keys - 1]
        return {
            "blurry": np.stack([self._load_maybe_resize(p) for p in b_paths]),
            "sharp": np.stack([self._load_maybe_resize(p) for p in s_paths]),
        }
