"""Grain loader in train(): a resumed run must replay the EXACT batch
sequence of an uninterrupted run (VERDICT r1 item 7; SURVEY.md §6.2/§6.4).

Strategy: identical restored params + identical batches => identical
per-step losses (CPU XLA is deterministic), so comparing the logged
loss_total sequence of [4 steps, resume to 8] against [8 steps straight]
proves batch-sequence equality end-to-end through checkpoint restore,
loader-state restore, and the global step accounting."""

import json
import os

import numpy as np
import pytest

from bin_tpu.config import get_config
from bin_tpu.training.trainer import train


def _tiny_cfg(tmp, loader="grain"):
    return get_config("config1_backbone_128", [
        "model.base_features=8", "model.num_res_blocks=1",
        "data.batch_size=2", "data.crop_size=(32,32)",
        f"data.loader={loader}",
        "checkpoint.save_interval_steps=2", "checkpoint.async_save=false",
        "log.log_interval_steps=1",
    ])


def _losses(workdir):
    out = {}
    with open(os.path.join(workdir, "metrics.jsonl")) as f:
        for line in f:
            rec = json.loads(line)
            out[rec["step"]] = rec["loss_total"]
    return out


def test_resumed_run_replays_exact_batches(tmp_path):
    cfg = _tiny_cfg(tmp_path)

    straight = str(tmp_path / "straight")
    state = train(cfg, workdir=straight, num_steps=8)
    assert int(np.asarray(state.step)) == 8
    want = _losses(straight)

    resumed = str(tmp_path / "resumed")
    train(cfg, workdir=resumed, num_steps=4)
    state = train(cfg, workdir=resumed, num_steps=8)  # auto-resume from 4
    assert int(np.asarray(state.step)) == 8
    got = _losses(resumed)

    assert set(got) == set(want) == set(range(1, 9))
    for step in range(5, 9):  # post-resume steps are the proof
        np.testing.assert_allclose(got[step], want[step], rtol=0, atol=0,
                                   err_msg=f"step {step} diverged on resume")


def test_loader_state_files_pruned(tmp_path):
    cfg = _tiny_cfg(tmp_path)
    wd = str(tmp_path / "run")
    train(cfg, workdir=wd, num_steps=10)
    loader_dir = os.path.join(wd, cfg.checkpoint.directory + "_loader")
    steps = sorted(int(p.split(".")[0]) for p in os.listdir(loader_dir))
    assert len(steps) <= cfg.checkpoint.keep_last_n
    assert steps[-1] == 10


def test_thread_loader_still_default(tmp_path):
    cfg = _tiny_cfg(tmp_path, loader="thread")
    wd = str(tmp_path / "run")
    state = train(cfg, workdir=wd, num_steps=2)
    assert int(np.asarray(state.step)) == 2
    assert not os.path.exists(os.path.join(
        wd, cfg.checkpoint.directory + "_loader"))
