"""Offline blur-synthesis tool ↔ FrameFolderSource roundtrip tests."""

import numpy as np
import pytest

from bin_tpu.data import synthetic
from bin_tpu.data.blur import synthesize_tree
from bin_tpu.data.frames import FrameFolderSource


@pytest.fixture(scope="module")
def tree(tmp_path_factory):
    """Write two tiny synthetic 240fps clips, run the prep tool on them."""
    root = tmp_path_factory.mktemp("data")
    src = root / "raw240"
    for clip_id, seed, frames in (("clipA", 1, 35), ("clipB", 2, 43)):
        d = src / clip_id
        d.mkdir(parents=True)
        clip = synthetic.render_sharp_clip(seed, frames, 24, 32)
        for i, frame in enumerate(clip):
            np.save(d / f"{i:06d}.npy", (frame * 255 + 0.5).astype(np.uint8))
    dst = root / "prepped"
    n = synthesize_tree(str(src), str(dst), taps=11, stride=8, verbose=False)
    assert n == 2
    return src, dst


def test_prep_tool_layout_and_counts(tree):
    src, dst = tree
    # clipA: 35 frames → (35-11)//8+1 = 4 keys, 7 sharp GT
    a_blur = sorted((dst / "blurry" / "clipA").iterdir())
    a_sharp = sorted((dst / "sharp" / "clipA").iterdir())
    assert len(a_blur) == 4 and len(a_sharp) == 7
    # clipB: 43 frames → 5 keys, 9 sharp
    assert len(list((dst / "blurry" / "clipB").iterdir())) == 5


def test_prep_blur_values_match_recipe(tree):
    src, dst = tree
    clip = synthetic.render_sharp_clip(1, 35, 24, 32)
    expected = synthetic.synthesize_blur(clip, 11, 8)
    got = np.load(dst / "blurry" / "clipA" / "000000.npy").astype(np.float32) / 255.0
    np.testing.assert_allclose(got, expected[0], atol=1.0 / 255.0)
    # sharp GT at t=1 is the 240fps frame at index 9
    got_s = np.load(dst / "sharp" / "clipA" / "000001.npy").astype(np.float32) / 255.0
    np.testing.assert_allclose(got_s, clip[9], atol=1.0 / 255.0)


def test_frame_folder_source_chunks(tree):
    _, dst = tree
    src4 = FrameFolderSource(str(dst), num_keys=4, chunk_stride=1)
    # clipA: 4 keys → 1 chunk; clipB: 5 keys → 2 chunks
    assert len(src4) == 3
    s = src4[0]
    assert s["blurry"].shape == (4, 24, 32, 3)
    assert s["sharp"].shape == (7, 24, 32, 3)
    assert s["blurry"].dtype == np.float32 and s["blurry"].max() <= 1.0


def test_frame_folder_source_full_clips(tree):
    _, dst = tree
    src = FrameFolderSource(str(dst), num_keys=None)
    assert len(src) == 2
    assert src[1]["blurry"].shape[0] == 5


def test_frame_folder_source_missing_root():
    with pytest.raises(FileNotFoundError):
        FrameFolderSource("/nonexistent/path")


def test_raw_u8_source_and_native_crop(tree):
    """raw_u8 source + pipeline crop = float source + numpy crop."""
    from bin_tpu.data.pipeline import _random_crop_flip
    _, dst = tree
    src_f = FrameFolderSource(str(dst), num_keys=4, chunk_stride=1)
    src_u = FrameFolderSource(str(dst), num_keys=4, chunk_stride=1, raw_u8=True)
    s_u = src_u[0]
    assert s_u["blurry"].dtype == np.uint8
    rng_a = np.random.Generator(np.random.Philox(5))
    rng_b = np.random.Generator(np.random.Philox(5))
    a = _random_crop_flip(src_f[0], (16, 16), rng_a, True)
    b = _random_crop_flip(s_u, (16, 16), rng_b, True)
    for k in a:
        assert b[k].dtype == np.float32
        np.testing.assert_allclose(a[k], b[k], atol=1.01 / 255.0)


def test_clip_list_restricts_and_orders(tree, tmp_path):
    """Sequence list files reproduce the standard split: only listed clips,
    in list order (SURVEY.md §3.2 Adobe240 row [R], VERDICT r2 missing #5)."""
    _, dst = tree
    lst = tmp_path / "trainlist.txt"
    lst.write_text("# standard split\nclipB\n\n")
    src = FrameFolderSource(str(dst), num_keys=3, clip_list=str(lst))
    assert set(c for c, _, _ in src.index) == {"clipB"}

    lst2 = tmp_path / "both.txt"
    lst2.write_text("clipB\nclipA\n")
    src2 = FrameFolderSource(str(dst), num_keys=None, clip_list=str(lst2))
    assert [c for c, _, _ in src2.index] == ["clipB", "clipA"]  # list order


def test_clip_list_errors(tree, tmp_path):
    _, dst = tree
    missing = tmp_path / "bad.txt"
    missing.write_text("clipA\nnope\n")
    with pytest.raises(ValueError, match="missing on disk"):
        FrameFolderSource(str(dst), clip_list=str(missing))
    dup = tmp_path / "dup.txt"
    dup.write_text("clipA\nclipA\n")
    with pytest.raises(ValueError, match="duplicates"):
        FrameFolderSource(str(dst), clip_list=str(dup))
    empty = tmp_path / "empty.txt"
    empty.write_text("# nothing\n")
    with pytest.raises(ValueError, match="empty"):
        FrameFolderSource(str(dst), clip_list=str(empty))


def test_eval_cli_whole_clips(tree, capsys):
    """data.eval_num_keys=0 → whole-sequence eval (the GoPro protocol)."""
    from bin_tpu.config import apply_overrides, get_config
    from bin_tpu.evaluation.evaluator import evaluate_cli

    _, dst = tree
    cfg = apply_overrides(get_config("config1_backbone_128"), {
        "model.base_features": 8, "model.num_res_blocks": 1,
        "data.dataset": "adobe240", "data.root": str(dst),
        "data.eval_num_keys": 0, "data.eval_size": (24, 32),
    })
    results = evaluate_cli(cfg)  # random-init weights: metrics just finite
    out = capsys.readouterr().out
    assert "keys=whole" in out
    assert "mean over 2 clips" in out  # clipA (4 keys) + clipB (5 keys)
    assert np.isfinite(results["psnr_overall"])


def test_eval_cli_whole_clips_needs_folder_dataset():
    from bin_tpu.config import apply_overrides, get_config
    from bin_tpu.evaluation.evaluator import evaluate_cli

    cfg = apply_overrides(get_config("config1_backbone_128"), {
        "model.base_features": 8, "data.eval_num_keys": 0,
        "data.eval_size": (16, 16),
    })
    with pytest.raises(ValueError, match="whole clips"):
        evaluate_cli(cfg)
