"""Video extraction stage (bin_tpu/data/video.py) — reference data-prep
stage 1 ("ffmpeg extract frames", SURVEY.md §4.3), rebuilt on OpenCV.

FFV1 is lossless, so the decode roundtrip must be bit-exact; that also lets
the full extract → blur-synth → loader chain be checked end to end without
codec-noise tolerances."""

import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from bin_tpu.data.blur import synthesize_tree
from bin_tpu.data.frames import FrameFolderSource
from bin_tpu.data.video import extract_frames, extract_tree


def _pattern(i: int, h: int = 48, w: int = 64) -> np.ndarray:
    """Deterministic moving-pattern frame, u8 RGB."""
    y, x = np.mgrid[0:h, 0:w]
    r = ((x + 3 * i) % w * 255 // w).astype(np.uint8)
    g = ((y + 2 * i) % h * 255 // h).astype(np.uint8)
    b = np.full((h, w), (i * 7) % 256, np.uint8)
    return np.stack([r, g, b], axis=-1)


def _write_video(path: str, num_frames: int) -> list[np.ndarray]:
    frames = [_pattern(i) for i in range(num_frames)]
    w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"FFV1"), 30.0, (64, 48))
    if not w.isOpened():
        pytest.skip("FFV1 codec unavailable in this OpenCV build")
    for f in frames:
        w.write(f[..., ::-1])  # writer expects BGR
    w.release()
    return frames


def test_extract_roundtrip_bit_exact(tmp_path):
    src = str(tmp_path / "clip.avi")
    frames = _write_video(src, 12)
    n = extract_frames(src, str(tmp_path / "out"))
    assert n == 12
    for i, want in enumerate(frames):
        got = np.load(tmp_path / "out" / f"{i:06d}.npy")
        assert got.dtype == np.uint8 and got.shape == (48, 64, 3)
        np.testing.assert_array_equal(got, want)


def test_extract_step_and_max(tmp_path):
    src = str(tmp_path / "clip.avi")
    frames = _write_video(src, 20)
    n = extract_frames(src, str(tmp_path / "out"), step=3, max_frames=5)
    assert n == 5
    for j in range(5):
        np.testing.assert_array_equal(
            np.load(tmp_path / "out" / f"{j:06d}.npy"), frames[3 * j])


def test_extract_tree_and_png(tmp_path):
    vids = tmp_path / "vids"
    vids.mkdir()
    _write_video(str(vids / "a.avi"), 6)
    _write_video(str(vids / "b.avi"), 6)
    n = extract_tree(str(vids), str(tmp_path / "frames"), fmt="png",
                     verbose=False)
    assert n == 2
    assert sorted(os.listdir(tmp_path / "frames")) == ["a", "b"]
    assert len(os.listdir(tmp_path / "frames" / "a")) == 6
    from PIL import Image
    got = np.asarray(Image.open(tmp_path / "frames" / "a" / "000002.png"))
    np.testing.assert_array_equal(got, _pattern(2))


def test_full_chain_extract_prep_load(tmp_path):
    """Video → extract → 11-tap/stride-8 blur synthesis → FrameFolderSource
    window — the complete reference data-prep call stack (SURVEY.md §4.3)."""
    vids = tmp_path / "vids"
    vids.mkdir()
    frames = _write_video(str(vids / "clip.avi"), 27)  # 3 keys at taps=11/stride=8
    extract_tree(str(vids), str(tmp_path / "frames"), verbose=False)
    n = synthesize_tree(str(tmp_path / "frames"), str(tmp_path / "ds"),
                        taps=11, stride=8, verbose=False)
    assert n == 1
    src = FrameFolderSource(str(tmp_path / "ds"), num_keys=3)
    sample = src[0]
    blurry, sharp = sample["blurry"], sample["sharp"]
    assert blurry.shape == (3, 48, 64, 3) and sharp.shape == (5, 48, 64, 3)
    # key 0 = mean of source frames 0..10 (lossless codec → exact recipe)
    want = np.mean([f.astype(np.float64) / 255.0 for f in frames[:11]], axis=0)
    got = blurry[0].astype(np.float64)
    if blurry.dtype == np.uint8:
        got /= 255.0
    assert np.abs(got - want).max() < 1 / 255.0 + 1e-6


def test_extract_rejects_bad_args(tmp_path):
    with pytest.raises(ValueError):
        extract_frames("nope.avi", str(tmp_path), step=0)
    with pytest.raises(FileNotFoundError):
        extract_tree(str(tmp_path), str(tmp_path / "o"))


def test_demo_accepts_video_file(tmp_path):
    """bin-tpu-demo --input <video file>: decode via data/video.py and run
    the full joint deblur + 2x-interp demo flow."""
    import dataclasses

    import jax

    from bin_tpu.cli import demo_main
    from bin_tpu.config import get_config
    from bin_tpu.registry import build_model
    from bin_tpu.weights import export_weights

    cfg = get_config("config2_pyramid")
    mc = dataclasses.replace(cfg.model, base_features=8, num_res_blocks=1)
    model = build_model(mc)
    params = model.init(jax.random.key(0), batch=1, height=32, width=32)
    wpath = str(tmp_path / "tiny.npz")
    export_weights(wpath, params, mc, {"preset": "tiny-test"})

    frames = [_pattern(i, 32, 32) for i in range(6)]
    vpath = str(tmp_path / "clip.avi")
    w = cv2.VideoWriter(vpath, cv2.VideoWriter_fourcc(*"FFV1"), 30.0, (32, 32))
    if not w.isOpened():
        pytest.skip("FFV1 codec unavailable in this OpenCV build")
    for f in frames:
        w.write(f[..., ::-1])
    w.release()

    out = tmp_path / "out"
    demo_main(["--weights", wpath, "--input", vpath, "--out", str(out)])
    pngs = sorted((out / "demo").glob("*.png"))
    assert len(pngs) == 2 * len(frames) - 3  # times 1..2K-3
