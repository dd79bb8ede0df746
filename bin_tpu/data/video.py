"""Video → frame extraction: the reference data-prep stage 1.

The reference pipeline starts from 240 fps source videos and extracts
per-frame images with ffmpeg before blur synthesis (SURVEY.md §4.3:
"ffmpeg extract 240fps frames" → `synthesize_tree`).  bin-tpu rebuilds
that stage on OpenCV (imageio fallback) with:

- **streaming decode** (`VideoCapture.read` loop / imageio iterator):
  O(1) memory regardless of clip length — a 240 fps 720p minute is
  ~14k frames and must never be materialized at once;
- **u8 `.npy` output by default**: the 1-core-host Grain/thread loaders
  read frames with `np.load` (no per-sample PNG decode on the hot path);
  `fmt="png"` is available for interchange with the reference layout;
- **fps down-conversion via ``step``** (keep every step-th frame), e.g.
  a 240 fps source extracted at step=2 gives the 120 fps variant of the
  blur-synthesis recipe.

`extract_tree` mirrors `blur.synthesize_tree`'s layout contract: each
video file becomes `out/<stem>/<%06d>.<fmt>`, which `synthesize_tree`
then turns into the blurry/sharp dataset `FrameFolderSource` loads — the
complete reference prep call stack, covered end-to-end (lossless FFV1 →
bit-exact recipe check) in tests/test_video.py.
"""

from __future__ import annotations

import os
from typing import Iterator

import numpy as np

__all__ = ["VIDEO_EXTS", "iter_video_frames", "extract_frames",
           "extract_tree", "extract_cli"]

# Extensions recognised as video inputs (demo `--input`, extract_tree scan).
VIDEO_EXTS = (".avi", ".mp4", ".mov", ".mkv", ".webm", ".m4v", ".mpg",
              ".mpeg", ".wmv")


def iter_video_frames(path: str) -> Iterator[np.ndarray]:
    """Stream a video file as uint8 RGB (H, W, 3) frames, O(1) memory.

    Prefers OpenCV (BGR→RGB swap); falls back to imageio when cv2 is not
    importable.  Raises FileNotFoundError for a missing file and ValueError
    when no backend can open it — EAGERLY, at call time (validation and the
    capture open happen here, not on first ``next()``; ADVICE r3), so
    callers that merely obtain the iterator still see a bad path fail.
    """
    if not os.path.isfile(path):
        raise FileNotFoundError(path)
    try:
        import cv2
    except ImportError:
        cv2 = None
    if cv2 is not None:
        cap = cv2.VideoCapture(path)
        if not cap.isOpened():
            cap.release()
            raise ValueError(f"could not open video: {path}")

        def _cv2_frames() -> Iterator[np.ndarray]:
            try:
                while True:
                    ok, frame = cap.read()
                    if not ok:
                        return
                    yield np.ascontiguousarray(frame[..., ::-1])  # BGR → RGB
            finally:
                cap.release()

        return _cv2_frames()
    try:
        import imageio.v2 as imageio
    except ImportError as e:
        raise ValueError(
            "neither cv2 nor imageio is available to decode "
            f"{path}") from e
    reader = imageio.get_reader(path)

    def _imageio_frames() -> Iterator[np.ndarray]:
        try:
            for frame in reader:
                frame = np.asarray(frame)
                if frame.ndim == 2:
                    frame = np.repeat(frame[..., None], 3, axis=-1)
                yield frame[..., :3].astype(np.uint8, copy=False)
        finally:
            reader.close()

    return _imageio_frames()


def _write_frame(frame: np.ndarray, out_dir: str, index: int,
                 fmt: str) -> None:
    name = os.path.join(out_dir, f"{index:06d}.{fmt}")
    if fmt == "npy":
        np.save(name, frame)
    elif fmt == "png":
        from PIL import Image
        Image.fromarray(frame).save(name)
    else:
        raise ValueError(f"fmt must be 'npy' or 'png', got {fmt!r}")


def extract_frames(src: str, out_dir: str, *, step: int = 1,
                   max_frames: int | None = None, fmt: str = "npy") -> int:
    """Decode ``src`` and write every ``step``-th frame to ``out_dir``.

    Output files are ``000000.<fmt>``, ``000001.<fmt>``, … (re-numbered
    densely after the step-downsample, matching the layout
    `synthesize_tree`/`FrameFolderSource` expect).  Returns the number of
    frames written.  Argument validation happens before any IO so a bad
    ``step`` fails fast even for a nonexistent file.
    """
    if step < 1:
        raise ValueError(f"step must be >= 1, got {step}")
    if max_frames is not None and max_frames < 0:
        raise ValueError(f"max_frames must be >= 0, got {max_frames}")
    if fmt not in ("npy", "png"):
        raise ValueError(f"fmt must be 'npy' or 'png', got {fmt!r}")
    os.makedirs(out_dir, exist_ok=True)
    written = 0
    for i, frame in enumerate(iter_video_frames(src)):
        if i % step:
            continue
        if max_frames is not None and written >= max_frames:
            break
        _write_frame(frame, out_dir, written, fmt)
        written += 1
    return written


def extract_tree(videos_dir: str, out_dir: str, *, step: int = 1,
                 max_frames: int | None = None, fmt: str = "npy",
                 verbose: bool = True) -> int:
    """Extract every video under ``videos_dir`` to ``out_dir/<stem>/``.

    Mirrors the reference layout: one frame folder per source clip, ready
    for `blur.synthesize_tree`.  Returns the number of videos extracted;
    raises FileNotFoundError when the directory contains no recognised
    video files (typo-proofing the prep CLI).
    """
    if not os.path.isdir(videos_dir):
        raise FileNotFoundError(videos_dir)
    vids = sorted(
        os.path.join(root, f)
        for root, _dirs, files in os.walk(videos_dir)
        for f in files if f.lower().endswith(VIDEO_EXTS))
    if not vids:
        raise FileNotFoundError(
            f"no video files ({'/'.join(VIDEO_EXTS)}) under {videos_dir}")
    for path in vids:
        stem = os.path.splitext(os.path.basename(path))[0]
        n = extract_frames(path, os.path.join(out_dir, stem), step=step,
                           max_frames=max_frames, fmt=fmt)
        if verbose:
            print(f"{path} → {out_dir}/{stem}: {n} frames")
    return len(vids)


def extract_cli(argv: list[str] | None = None) -> None:
    """`bin-tpu-extract`: videos → frame folders (prep stage 1).

    Typical Adobe240 flow on a fresh machine:
        bin-tpu-extract --videos raw_videos/ --out frames/
        bin-tpu-prep --frames frames/ --out dataset/   # 11-tap/stride-8
    """
    import argparse

    p = argparse.ArgumentParser(description=extract_cli.__doc__)
    p.add_argument("--videos", required=True,
                   help="a video file or a directory of videos")
    p.add_argument("--out", required=True, help="output frame-folder root")
    p.add_argument("--step", type=int, default=1,
                   help="keep every step-th frame (fps down-conversion)")
    p.add_argument("--max-frames", type=int, default=None,
                   help="cap frames per video")
    p.add_argument("--fmt", default="npy", choices=("npy", "png"),
                   help="frame format (npy = loader-native, png = portable)")
    args = p.parse_args(argv)
    if os.path.isdir(args.videos):
        n = extract_tree(args.videos, args.out, step=args.step,
                         max_frames=args.max_frames, fmt=args.fmt)
        print(f"extracted {n} videos → {args.out}")
    else:
        stem = os.path.splitext(os.path.basename(args.videos))[0]
        n = extract_frames(args.videos, os.path.join(args.out, stem),
                           step=args.step, max_frames=args.max_frames,
                           fmt=args.fmt)
        print(f"extracted {n} frames → {args.out}/{stem}")
