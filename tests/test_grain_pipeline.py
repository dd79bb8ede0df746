"""Grain loader option: batch contract + determinism (SURVEY.md §6.2)."""

import numpy as np

from bin_tpu.data.grain_pipeline import grain_train_iterator
from bin_tpu.data.pipeline import SyntheticSource


def _take(it, n):
    return [next(it) for _ in range(n)]


def test_grain_batch_contract():
    src = SyntheticSource(num_samples=6, num_keys=4, height=40, width=40)
    it = grain_train_iterator(src, batch_size=2, crop_size=(32, 32), seed=0)
    batch = next(it)
    assert batch["blurry"].shape == (2, 4, 32, 32, 3)
    assert batch["sharp"].shape == (2, 7, 32, 32, 3)
    assert batch["blurry"].dtype == np.float32


def test_grain_determinism():
    src = SyntheticSource(num_samples=6, num_keys=4, height=40, width=40)
    a = _take(grain_train_iterator(src, 2, (32, 32), seed=7), 3)
    b = _take(grain_train_iterator(src, 2, (32, 32), seed=7), 3)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x["blurry"], y["blurry"])
        np.testing.assert_array_equal(x["sharp"], y["sharp"])


def test_grain_seed_changes_stream():
    src = SyntheticSource(num_samples=6, num_keys=4, height=40, width=40)
    a = next(grain_train_iterator(src, 2, (32, 32), seed=1))
    b = next(grain_train_iterator(src, 2, (32, 32), seed=2))
    assert not np.array_equal(a["blurry"], b["blurry"])
