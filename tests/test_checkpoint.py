"""Checkpoint save/restore roundtrip (SURVEY.md §6.3-6.4: keep-latest-k,
auto-resume from newest valid step)."""

import dataclasses

import jax
import numpy as np
import pytest

from bin_tpu.config import get_config
from bin_tpu.registry import build_model
from bin_tpu.training import checkpoint as ckpt
from bin_tpu.training.state import create_train_state


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    cfg = get_config("config1_backbone_128")
    cfg = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, base_features=8,
                                       num_res_blocks=1))
    model = build_model(cfg)
    state = create_train_state(cfg, model, jax.random.key(0),
                               sample_hw=(32, 32))
    return cfg, model, state, tmp_path_factory.mktemp("ckpt")


def test_save_restore_roundtrip(setup):
    cfg, model, state, root = setup
    d = str(root / "a")
    manager = ckpt.make_manager(d, cfg.checkpoint)
    state = dataclasses.replace(state)  # noqa: keep original
    ckpt.save(manager, 1, state)
    state2 = jax.tree.map(lambda x: x * 0, state)
    manager.wait_until_finished()
    restored = ckpt.restore_if_available(ckpt.make_manager(d), state2)
    for a, b in zip(jax.tree.leaves(state), jax.tree.leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_restore_without_checkpoint_is_noop(setup):
    cfg, model, state, root = setup
    manager = ckpt.make_manager(str(root / "empty"))
    out = ckpt.restore_if_available(manager, state)
    assert out is state


def test_restore_params_only(setup):
    cfg, model, state, root = setup
    d = str(root / "b")
    manager = ckpt.make_manager(d, cfg.checkpoint)
    ckpt.save(manager, 5, state)
    manager.wait_until_finished()
    params = ckpt.restore_params(d)
    for a, b in zip(jax.tree.leaves(state.params), jax.tree.leaves(params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_restore_params_missing_dir(tmp_path):
    with pytest.raises(FileNotFoundError):
        ckpt.restore_params(str(tmp_path / "nothing"))


def test_keep_last_n(setup):
    cfg, model, state, root = setup
    d = str(root / "c")
    manager = ckpt.make_manager(d, dataclasses.replace(
        cfg.checkpoint, keep_last_n=2, async_save=False))
    for step in (1, 2, 3):
        ckpt.save(manager, step, state)
    manager.wait_until_finished()
    assert manager.latest_step() == 3
    assert sorted(manager.all_steps()) == [2, 3]

def test_final_step_checkpoint_always_saved(tmp_path):
    """A run whose last step is not on the save interval still leaves a
    checkpoint (short runs must be evaluable/resumable — VERDICT r1 item 4's
    rehearsal trains 300 steps with interval 1000)."""
    from bin_tpu.training.trainer import train

    cfg = get_config("config1_backbone_128")
    cfg = dataclasses.replace(
        cfg,
        model=dataclasses.replace(cfg.model, base_features=8, num_res_blocks=1),
        data=dataclasses.replace(cfg.data, crop_size=(32, 32), batch_size=2),
    )
    wd = str(tmp_path / "run")
    train(cfg, workdir=wd, num_steps=3)
    import os
    steps = os.listdir(os.path.join(wd, cfg.checkpoint.directory))
    assert "3" in steps, steps
