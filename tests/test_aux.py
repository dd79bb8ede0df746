"""Aux subsystem tests: remat training equivalence, multi-host utils,
eval frame resize, PNG output writer."""

import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bin_tpu.config import LossConfig, ModelConfig
from bin_tpu.registry import build_model


def test_remat_loss_and_grads_match():
    """remat=True must change memory, not math."""
    cfg = ModelConfig(name="prf", base_features=8, num_res_blocks=1,
                      convlstm_features=16, stem_factor=1)
    model = build_model(cfg)
    params = model.init(jax.random.key(0), batch=1, height=32, width=32)
    rng = np.random.default_rng(0)
    blurry = jnp.asarray(rng.uniform(0, 1, (1, 6, 32, 32, 3)).astype(np.float32))
    sharp = jnp.asarray(rng.uniform(0, 1, (1, 11, 32, 32, 3)).astype(np.float32))
    lcfg = LossConfig()

    def loss(p, m):
        return m.loss_clip(p, blurry, sharp, lcfg)[0]

    model_r = build_model(dataclasses.replace(cfg, remat=True))
    l0, g0 = jax.value_and_grad(loss)(params, model)
    l1, g1 = jax.value_and_grad(loss)(params, model_r)
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-7)


def test_maybe_initialize_noop_single_process():
    from bin_tpu.parallel import distributed
    assert distributed.maybe_initialize() is False
    assert distributed.is_multi_host() is False
    per, off = distributed.process_batch_slice(8)
    assert (per, off) == (8, 0)
    # divisibility error only fires multi-process; single-process 7 is fine
    assert distributed.process_batch_slice(7) == (7, 0)


def test_frame_source_resize(tmp_path):
    from bin_tpu.data.frames import FrameFolderSource
    for split, count in (("blurry", 4), ("sharp", 7)):
        d = tmp_path / split / "clip0"
        d.mkdir(parents=True)
        for i in range(count):
            np.save(d / f"{i:06d}.npy",
                    np.full((16, 24, 3), i * 10, dtype=np.uint8))
    src = FrameFolderSource(str(tmp_path), num_keys=4, resize_to=(8, 12))
    s = src[0]
    assert s["blurry"].shape == (4, 8, 12, 3)
    assert s["sharp"].shape == (7, 8, 12, 3)
    # constant frames survive resize exactly
    np.testing.assert_allclose(s["sharp"][3], 30.0 / 255.0, atol=1e-3)


def test_save_clip_frames(tmp_path):
    from bin_tpu.evaluation.evaluator import save_clip_frames
    video = np.random.default_rng(0).uniform(0, 1, (3, 16, 16, 3)).astype(np.float32)
    times = np.array([1, 2, 3])
    save_clip_frames(video, times, str(tmp_path), "clipX")
    files = sorted(os.listdir(tmp_path / "clipX"))
    assert files == ["t000001.png", "t000002.png", "t000003.png"]
    from PIL import Image
    arr = np.asarray(Image.open(tmp_path / "clipX" / "t000001.png"))
    np.testing.assert_allclose(arr / 255.0, np.clip(video[0], 0, 1), atol=2e-2)


def test_stall_watchdog_exits_91():
    """Failure-detection subsystem (SURVEY.md §6.3): a run that stops
    beating must abort the PROCESS with the retryable exit code 91 (queue
    scripts key on it) — checked end to end in a subprocess."""
    import subprocess
    import sys

    code = (
        "import time\n"
        "from bin_tpu.training.trainer import StallWatchdog\n"
        "w = StallWatchdog(0.5)\n"
        "w.beat()\n"
        "time.sleep(30)\n"          # no further beats: watchdog must fire
        "print('should not reach')\n")
    r = subprocess.run([sys.executable, "-c", code], timeout=120,
                       capture_output=True, text=True)
    assert r.returncode == 91, (r.returncode, r.stderr[-500:])
    assert "should not reach" not in r.stdout

    code_ok = (
        "import time\n"
        "from bin_tpu.training.trainer import StallWatchdog\n"
        "w = StallWatchdog(5.0)\n"
        "for _ in range(6):\n"
        "    w.beat(); time.sleep(0.2)\n"
        "w.stop()\n"
        "time.sleep(1.0)\n"         # after stop(), no late fire
        "print('clean exit')\n")
    r = subprocess.run([sys.executable, "-c", code_ok], timeout=120,
                       capture_output=True, text=True)
    assert r.returncode == 0 and "clean exit" in r.stdout


def _desymmetrize(params):
    """Jitter every param leaf: a FRESH-init model is exactly
    flip-equivariant (the synthesis tail is zero-initialized, so it outputs
    the average of its two input frames) — TTA would bit-equal the plain
    eval and the tests below would vacuously pass/fail.  Noise breaks the
    symmetry the way training does."""
    leaves, treedef = jax.tree.flatten(params)
    rng = np.random.default_rng(1234)
    leaves = [np.asarray(l) + 0.02 * rng.standard_normal(np.shape(l)).astype(np.float32)
              for l in leaves]
    return jax.tree.unflatten(treedef, [jnp.asarray(l) for l in leaves])


def test_self_ensemble_is_mean_of_unflipped_variants():
    """TTA eval must equal the hand-computed mean over the 4 spatial-flip
    passes of infer_clip — exact construction, no tolerance slack beyond
    float accumulation order."""
    from bin_tpu.evaluation.evaluator import clip_metrics_fn

    cfg = ModelConfig(name="prf", base_features=8, num_res_blocks=1,
                      convlstm_features=16, stem_factor=1)
    model = build_model(cfg)
    params = model.init(jax.random.key(0), batch=1, height=32, width=32)
    params = _desymmetrize(params)
    rng = np.random.default_rng(1)
    blurry = jnp.asarray(rng.uniform(0, 1, (1, 6, 32, 32, 3)).astype(np.float32))
    sharp = jnp.asarray(rng.uniform(0, 1, (1, 11, 32, 32, 3)).astype(np.float32))

    fn_tta, times = clip_metrics_fn(model, 6, return_video=True,
                                    self_ensemble=True)
    metrics_tta, video_tta = fn_tta(params, blurry, sharp)

    acc = None
    for fh in (False, True):
        for fw in (False, True):
            x = blurry[:, :, ::-1] if fh else blurry
            x = x[:, :, :, ::-1] if fw else x
            v = model.infer_clip(params, x)[0].astype(jnp.float32)
            v = v[:, :, ::-1] if fh else v
            v = v[:, :, :, ::-1] if fw else v
            acc = v if acc is None else acc + v
    want = np.clip(np.asarray(acc) / 4.0, 0.0, 1.0)
    np.testing.assert_allclose(np.asarray(video_tta), want,
                               rtol=1e-5, atol=1e-6)
    # and the TTA metrics differ from plain (the model is not exactly
    # flip-equivariant), but are finite and in a sane PSNR range
    fn_plain, _ = clip_metrics_fn(model, 6)
    plain = jax.device_get(fn_plain(params, blurry, sharp))
    tta = jax.device_get(metrics_tta)
    assert np.isfinite(tta["psnr"]["overall"]).all()
    assert 0.0 < float(np.mean(tta["psnr"]["overall"])) < 60.0
    assert not np.allclose(np.asarray(tta["psnr"]["overall"]),
                           np.asarray(plain["psnr"]["overall"]))


def test_self_ensemble_through_evaluate():
    """The evaluate() plumbing honors self_ensemble and keeps distinct
    jitted programs in a shared fn_cache."""
    from bin_tpu.evaluation.evaluator import evaluate

    cfg = ModelConfig(name="prf", base_features=8, num_res_blocks=1,
                      convlstm_features=16, stem_factor=1)
    model = build_model(cfg)
    params = model.init(jax.random.key(0), batch=1, height=32, width=32)
    params = _desymmetrize(params)
    rng = np.random.default_rng(2)
    clip = {"blurry": rng.uniform(0, 1, (1, 6, 32, 32, 3)).astype(np.float32),
            "sharp": rng.uniform(0, 1, (1, 11, 32, 32, 3)).astype(np.float32)}
    cache: dict = {}
    plain = evaluate(model, params, [clip], verbose=False, fn_cache=cache)
    tta = evaluate(model, params, [clip], verbose=False, fn_cache=cache,
                   self_ensemble=True)
    assert len(cache) == 2  # flag is part of the cache key
    assert np.isfinite(tta["psnr_overall"])
    assert tta["psnr_overall"] != plain["psnr_overall"]
