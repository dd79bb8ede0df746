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
