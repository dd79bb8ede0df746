"""End-to-end training smoke + overfit tests (SURVEY.md §5: 1-step smoke per
driver config; §8 stage 2: overfit a tiny clip to near-zero loss)."""

import dataclasses

import jax
import numpy as np
import pytest

from bin_tpu.config import get_config
from bin_tpu.data.pipeline import SyntheticSource, train_iterator
from bin_tpu.registry import build_model
from bin_tpu.training.state import create_train_state
from bin_tpu.training.trainer import make_train_step
from bin_tpu.utils.logging import MetricLogger


def _tiny(cfg):
    """Shrink a preset to unit-test scale (tiny channels, 32x32 crops)."""
    return dataclasses.replace(
        cfg,
        model=dataclasses.replace(cfg.model, base_features=8,
                                  num_res_blocks=1, convlstm_features=16),
        data=dataclasses.replace(cfg.data, crop_size=(32, 32), batch_size=2,
                                 seq_len=max(4, min(cfg.data.seq_len, 5))),
    )


@pytest.mark.parametrize("preset", [
    "config1_backbone_128", "config2_pyramid", "config3_prf",
    "config3_prf_extended"])
def test_one_train_step_per_config(preset):
    cfg = _tiny(get_config(preset))
    model = build_model(cfg)
    state = create_train_state(cfg, model, jax.random.key(0))
    src = SyntheticSource(4, cfg.data.seq_len, 48, 48, seed=0)
    batch = next(train_iterator(src, cfg.data.batch_size, cfg.data.crop_size))
    step = make_train_step(model, cfg)
    state2, aux = step(state, batch)
    assert int(state2.step) == 1
    assert np.isfinite(float(aux["loss_total"]))
    assert float(aux["grad_norm"]) > 0


def test_overfit_stem4_packed():
    """The stem-4 packed model (config5's architecture) must also learn —
    guards the depth-to-space tail + packed supervision path."""
    cfg = _tiny(get_config("config5_v5e_streaming"))
    cfg = dataclasses.replace(
        cfg,
        model=dataclasses.replace(cfg.model, dtype="float32", stem_factor=4,
                                  base_features=32),
        optim=dataclasses.replace(cfg.optim, learning_rate=2e-3),
    )
    model = build_model(cfg)
    state = create_train_state(cfg, model, jax.random.key(0))
    src = SyntheticSource(1, cfg.data.seq_len, 40, 40, seed=5)
    batch = next(train_iterator(src, 2, (32, 32), seed=0, random_flip=False))
    step = make_train_step(model, cfg)
    first = None
    for _ in range(120):
        state, aux = step(state, batch)
        if first is None:
            first = float(aux["loss_total"])
    # stem-4 converges more slowly than stem-1 at tiny widths (measured
    # curve: ~0.24x over 120 steps); 0.5x is a robust learning check
    assert float(aux["loss_total"]) < 0.5 * first, (first, float(aux["loss_total"]))


def test_overfit_tiny_clip():
    """Loss must drop substantially when overfitting one batch — the
    end-to-end learning sanity check (SURVEY.md §8 stage 2)."""
    cfg = _tiny(get_config("config1_backbone_128"))
    cfg = dataclasses.replace(
        cfg, optim=dataclasses.replace(cfg.optim, learning_rate=2e-3))
    model = build_model(cfg)
    state = create_train_state(cfg, model, jax.random.key(0))
    src = SyntheticSource(1, 4, 40, 40, seed=3)
    batch = next(train_iterator(src, 2, (32, 32), seed=0, random_flip=False))
    step = make_train_step(model, cfg)

    first = None
    for _ in range(60):
        state, aux = step(state, batch)
        if first is None:
            first = float(aux["loss_total"])
    last = float(aux["loss_total"])
    assert last < 0.5 * first, (first, last)


def test_metric_logger(tmp_path):
    import json
    path = tmp_path / "m.jsonl"
    logger = MetricLogger(str(path))
    logger.log(1, loss=0.5, note="hi")
    logger.log(2, loss=0.25)
    logger.close()
    lines = [json.loads(l) for l in path.read_text().splitlines()]
    assert lines[0]["step"] == 1 and lines[0]["loss"] == 0.5
    assert lines[1]["loss"] == 0.25


def test_lr_warmup_schedule():
    """optim.lr_warmup_steps prepends a linear 0->lr ramp; the decay
    schedule then counts from the end of warmup."""
    from bin_tpu.config import OptimConfig
    from bin_tpu.training.state import make_lr_schedule

    cfg = OptimConfig(learning_rate=1e-3, lr_warmup_steps=100,
                      lr_decay_steps=200, lr_decay_rate=0.5)
    sched = make_lr_schedule(cfg)
    assert float(sched(0)) == 0.0
    assert abs(float(sched(50)) - 5e-4) < 1e-9
    assert abs(float(sched(100)) - 1e-3) < 1e-9
    assert abs(float(sched(250)) - 1e-3) < 1e-9   # decay counts post-warmup
    assert abs(float(sched(301)) - 5e-4) < 1e-9   # first decay at warmup+200


def test_stall_watchdog_exits_91_when_stalled():
    """Failure detection (SURVEY.md §6.3): a wedged device tunnel must abort
    the process with the retryable exit code instead of hanging forever."""
    import subprocess
    import sys

    code = ("from bin_tpu.training.trainer import StallWatchdog\n"
            "import time\n"
            "w = StallWatchdog(timeout_s=0.5)\n"
            "time.sleep(30)\n")
    p = subprocess.run([sys.executable, "-c", code], timeout=120)
    assert p.returncode == StallWatchdogExitCode()


def StallWatchdogExitCode():
    from bin_tpu.training.trainer import StallWatchdog
    return StallWatchdog.EXIT_CODE


def test_stall_watchdog_beats_keep_it_quiet():
    """Regular beats (the loop making progress) must never trigger the
    abort, and stop() must shut the thread down cleanly."""
    import time

    from bin_tpu.training.trainer import StallWatchdog

    w = StallWatchdog(timeout_s=0.4)
    for _ in range(8):
        time.sleep(0.1)
        w.beat()
    w.stop()
    w._thread.join(timeout=5)
    assert not w._thread.is_alive()


def test_grad_accum_matches_unsplit_step():
    """optim.grad_accum_steps=4 must produce the same update as the unsplit
    step on the same batch (the loss is a batch mean, so averaged
    microbatch grads == full-batch grads), at ~1/4 activation memory."""
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from bin_tpu.config import get_config
    from bin_tpu.data.pipeline import SyntheticSource, train_iterator
    from bin_tpu.registry import build_model
    from bin_tpu.training.state import create_train_state
    from bin_tpu.training.trainer import make_train_step

    cfg = get_config("config3_prf", [
        "model.base_features=8", "model.num_res_blocks=1",
        "model.convlstm_features=16", "data.crop_size=32,32",
        "data.batch_size=8"])
    model = build_model(cfg)
    state = create_train_state(cfg, model, jax.random.key(0))
    batch = next(train_iterator(SyntheticSource(4, 4, 48, 48, seed=0), 8,
                                (32, 32), seed=1, random_flip=False))
    batch = jax.tree.map(jnp.asarray, batch)

    new_a, aux_a = make_train_step(model, cfg)(
        jax.tree.map(jnp.copy, state), batch)
    cfg4 = dataclasses.replace(
        cfg, optim=dataclasses.replace(cfg.optim, grad_accum_steps=4))
    new_b, aux_b = make_train_step(model, cfg4)(
        jax.tree.map(jnp.copy, state), batch)

    np.testing.assert_allclose(float(aux_a["loss_total"]),
                               float(aux_b["loss_total"]), rtol=1e-6)
    np.testing.assert_allclose(float(aux_a["grad_norm"]),
                               float(aux_b["grad_norm"]), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(new_a.params),
                    jax.tree.leaves(new_b.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=1e-7)

    # indivisible batch is rejected at trace time
    cfg3 = dataclasses.replace(
        cfg, optim=dataclasses.replace(cfg.optim, grad_accum_steps=3))
    import pytest as _pytest
    with _pytest.raises(ValueError, match="divisible"):
        make_train_step(model, cfg3)(jax.tree.map(jnp.copy, state), batch)


def test_in_training_eval_and_best_weights(tmp_path):
    """log.eval_interval_steps: the reference's per-epoch validation + save
    best (SURVEY.md §4.1) — eval_* metrics land in the JSONL stream and the
    best-PSNR weights are exported to <workdir>/best.npz with a card."""
    import json as _json
    import os

    import numpy as np

    from bin_tpu.config import get_config
    from bin_tpu.training.trainer import train
    from bin_tpu.weights import load_weights

    cfg = get_config("config1_backbone_128", [
        "model.base_features=8", "data.crop_size=32,32", "data.batch_size=2",
        "data.eval_size=32,32", "data.eval_num_keys=4",
        "log.eval_interval_steps=4", "log.eval_clips=2",
        "log.log_interval_steps=4", "checkpoint.save_interval_steps=100"])
    wd = str(tmp_path / "run")
    train(cfg, workdir=wd, num_steps=8)

    records = [_json.loads(l) for l in open(os.path.join(wd, "metrics.jsonl"))]
    evals = [r for r in records if "eval_psnr_overall" in r]
    assert [r["step"] for r in evals] == [4, 8]
    assert all(np.isfinite(r["eval_psnr_overall"]) for r in evals)

    params, mc, meta = load_weights(os.path.join(wd, "best.npz"))
    assert meta["psnr_overall"] == max(r["eval_psnr_overall"] for r in evals)
    assert meta["step"] in (4, 8) and meta["eval_clips"] == 2
    assert mc.base_features == 8


def test_init_from_reseats_ema_shadow(tmp_path):
    """--init-from must re-seat the EMA shadow AT the restored params, not
    leave it at the random init (regression: a 2k-step warm-started QAT
    fine-tune's EMA eval scored 26.31 dB vs 28.5 raw because the shadow
    still held ~13.5% random weights — runs/r4_qat128b, round 4)."""
    import os

    import jax
    import numpy as np

    from bin_tpu.config import get_config
    from bin_tpu.training.checkpoint import restore_params
    from bin_tpu.training.trainer import train

    cfg = get_config("config1_backbone_128", [
        "model.base_features=8", "data.crop_size=32,32", "data.batch_size=2",
        "optim.ema_decay=0.999", "checkpoint.save_interval_steps=2",
        "log.log_interval_steps=2"])
    src = str(tmp_path / "src")
    train(cfg, workdir=src, num_steps=2)
    src_params = restore_params(os.path.join(src, "checkpoints"))

    dst = str(tmp_path / "dst")
    train(cfg, workdir=dst, num_steps=2,
          init_params_from=os.path.join(src, "checkpoints"))
    ema = restore_params(os.path.join(dst, "checkpoints"), ema=True)

    # after only 2 steps at decay 0.999 the EMA must still be ~AT the
    # warm-start params; with the bug it is ~at the dst run's random init
    def rel(a, b):
        na = float(np.linalg.norm(np.asarray(a, np.float64).ravel()))
        return float(np.linalg.norm(
            (np.asarray(a, np.float64) - np.asarray(b, np.float64)).ravel())
        ) / max(na, 1e-9)
    rels = jax.tree.leaves(jax.tree.map(rel, ema, src_params))
    assert float(np.median(rels)) < 0.05, rels[:5]
