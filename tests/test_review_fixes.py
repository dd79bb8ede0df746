"""Regression tests for code-review findings (round 1)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bin_tpu.config import LossConfig, ModelConfig
from bin_tpu.data import fastops
from bin_tpu.data.pipeline import eval_clips
from bin_tpu.losses import pyramid_loss


def test_native_blur_rejects_short_clip():
    """(t-taps)/stride truncation must not cause an OOB read for t < taps."""
    f = np.zeros((5, 4, 4, 3), np.uint8)
    with pytest.raises(ValueError):
        fastops.blur_average_u8(f, 11, 8)


def test_cycle_loss_active_for_odd_window_size():
    """window_size=5: the cycle term must tie level 1 and level 3 at a
    shared odd timestamp instead of silently vanishing."""
    rng = np.random.default_rng(0)
    k = 5
    outputs = [jnp.asarray(rng.normal(size=(1, k - 1 - li, 8, 8, 3))
                           .astype(np.float32)) for li in range(3)]
    gt = jnp.asarray(rng.normal(size=(1, 2 * k - 1, 8, 8, 3)).astype(np.float32))
    _, aux = pyramid_loss(outputs, gt, LossConfig(cycle_weight=0.1), k)
    assert "loss_cycle" in aux
    assert float(aux["loss_cycle"]) > 0


def test_eval_clips_mixed_clip_lengths():
    """Full-clip sources yield different lengths; batching must group by
    shape instead of crashing in np.stack."""
    class Mixed:
        lengths = [4, 5, 4, 5, 5]

        def __len__(self):
            return len(self.lengths)

        def __getitem__(self, i):
            k = self.lengths[i]
            return {"blurry": np.zeros((k, 8, 8, 3), np.float32),
                    "sharp": np.zeros((2 * k - 1, 8, 8, 3), np.float32)}

    batches = list(eval_clips(Mixed(), batch_size=2))
    shapes = sorted(b["blurry"].shape for b in batches)
    total_valid = sum(int(b["valid"].sum()) for b in batches)
    assert total_valid == 5
    assert all(b["blurry"].shape[0] == 2 for b in batches)
    assert {s[1] for s in shapes} == {4, 5}


def test_console_bench_importable_from_package():
    from bin_tpu import benchmark
    assert callable(benchmark.main)