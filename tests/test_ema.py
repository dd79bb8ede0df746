"""Parameter EMA (optim.ema_decay): recurrence math, checkpoint roundtrip,
and restore_params(ema=...) error paths.  The reference recipe has no EMA
(SURVEY.md §4.1) — this is a framework extension; default off."""

import dataclasses

import jax
import numpy as np
import pytest

from bin_tpu.config import get_config
from bin_tpu.data.pipeline import SyntheticSource, train_iterator
from bin_tpu.registry import build_model
from bin_tpu.training import checkpoint as ckpt
from bin_tpu.training.state import create_train_state
from bin_tpu.training.trainer import make_train_step


def _tiny_cfg(ema_decay=0.5):
    cfg = get_config("config1_backbone_128")
    return dataclasses.replace(
        cfg,
        model=dataclasses.replace(cfg.model, base_features=8,
                                  num_res_blocks=1),
        data=dataclasses.replace(cfg.data, crop_size=(32, 32), batch_size=2,
                                 seq_len=4),
        optim=dataclasses.replace(cfg.optim, ema_decay=ema_decay),
    )


def _batch(cfg):
    src = SyntheticSource(2, cfg.data.seq_len, 48, 48, seed=0)
    return next(train_iterator(src, cfg.data.batch_size, cfg.data.crop_size,
                               seed=0, random_flip=False))


def test_ema_tracks_recurrence():
    """ema_{i+1} = d*ema_i + (1-d)*params_{i+1}, starting AT the init params."""
    cfg = _tiny_cfg(ema_decay=0.5)
    model = build_model(cfg)
    state = create_train_state(cfg, model, jax.random.key(0))
    assert state.ema_params is not None
    for a, b in zip(jax.tree.leaves(state.params),
                    jax.tree.leaves(state.ema_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    step = make_train_step(model, cfg)
    batch = _batch(cfg)
    expected = jax.tree.map(np.asarray, state.ema_params)
    for _ in range(3):
        state, _ = step(state, batch)
        expected = jax.tree.map(
            lambda e, p: 0.5 * e + 0.5 * np.asarray(p),
            expected, state.params)
        for e, s in zip(jax.tree.leaves(expected),
                        jax.tree.leaves(state.ema_params)):
            np.testing.assert_allclose(e, np.asarray(s), rtol=2e-5, atol=2e-6)
    # and the EMA genuinely lags the raw params after updates
    diffs = [float(np.abs(np.asarray(s) - np.asarray(p)).max())
             for s, p in zip(jax.tree.leaves(state.ema_params),
                             jax.tree.leaves(state.params))]
    assert max(diffs) > 0


def test_ema_disabled_is_none():
    cfg = _tiny_cfg(ema_decay=0.0)
    model = build_model(cfg)
    state = create_train_state(cfg, model, jax.random.key(0))
    assert state.ema_params is None
    state2, _ = make_train_step(model, cfg)(state, _batch(cfg))
    assert state2.ema_params is None  # and the step runs fine without it


def test_ema_checkpoint_roundtrip(tmp_path):
    cfg = _tiny_cfg(ema_decay=0.9)
    model = build_model(cfg)
    state = create_train_state(cfg, model, jax.random.key(0))
    state, _ = make_train_step(model, cfg)(state, _batch(cfg))

    d = str(tmp_path / "ema_ckpt")
    manager = ckpt.make_manager(d, cfg.checkpoint)
    ckpt.save(manager, 1, state)
    manager.wait_until_finished()

    got_params = ckpt.restore_params(d)
    got_ema = ckpt.restore_params(d, ema=True)
    for a, b in zip(jax.tree.leaves(state.params), jax.tree.leaves(got_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(state.ema_params), jax.tree.leaves(got_ema)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # ema tree differs from params after a step (distinct restore targets)
    assert any(np.abs(np.asarray(a) - np.asarray(b)).max() > 0
               for a, b in zip(jax.tree.leaves(got_params),
                               jax.tree.leaves(got_ema)))


def test_restore_ema_from_non_ema_checkpoint_raises(tmp_path):
    cfg = _tiny_cfg(ema_decay=0.0)
    model = build_model(cfg)
    state = create_train_state(cfg, model, jax.random.key(0))
    d = str(tmp_path / "plain_ckpt")
    manager = ckpt.make_manager(d, cfg.checkpoint)
    ckpt.save(manager, 1, state)
    manager.wait_until_finished()
    with pytest.raises(ValueError, match="no EMA"):
        ckpt.restore_params(d, ema=True)
