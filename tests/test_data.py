"""Synthetic data generator + pipeline tests (SURVEY.md §4.3 recipe)."""

import numpy as np

from bin_tpu.data import pipeline, synthetic


def test_blur_synthesis_matches_direct_mean():
    rng = np.random.default_rng(0)
    clip = rng.uniform(0, 1, (51, 8, 8, 3)).astype(np.float32)
    blurry = synthetic.synthesize_blur(clip, taps=11, stride=8)
    assert blurry.shape == (6, 8, 8, 3)
    for k in range(6):
        np.testing.assert_allclose(
            blurry[k], clip[k * 8: k * 8 + 11].mean(axis=0), atol=1e-5)


def test_gt_indices_interleave_keys_and_midpoints():
    idx = synthetic.gt_indices(4, taps=11, stride=8)
    # keys at 240fps indices 5,13,21,29; midpoints at 9,17,25
    np.testing.assert_array_equal(idx, [5, 9, 13, 17, 21, 25, 29])


def test_make_sample_shapes_and_determinism():
    a = synthetic.make_sample(7, num_keys=4, height=32, width=48)
    b = synthetic.make_sample(7, num_keys=4, height=32, width=48)
    assert a["blurry"].shape == (4, 32, 48, 3)
    assert a["sharp"].shape == (7, 32, 48, 3)
    np.testing.assert_array_equal(a["blurry"], b["blurry"])
    assert a["blurry"].min() >= 0.0 and a["blurry"].max() <= 1.0


def test_blur_actually_blurs():
    """Blurry frames must differ from their sharp GT (moving content)."""
    s = synthetic.make_sample(3, num_keys=4, height=64, width=64)
    diff = np.abs(s["blurry"][0] - s["sharp"][0]).mean()
    assert diff > 1e-3, "synthetic motion too weak to produce blur"


def test_train_iterator_batches():
    src = pipeline.SyntheticSource(num_samples=4, num_keys=4, height=40, width=40)
    it = pipeline.train_iterator(src, batch_size=2, crop_size=(32, 32), seed=0)
    batch = next(it)
    assert batch["blurry"].shape == (2, 4, 32, 32, 3)
    assert batch["sharp"].shape == (2, 7, 32, 32, 3)
    assert batch["blurry"].dtype == np.float32


def test_eval_clips_padding_mask():
    src = pipeline.SyntheticSource(num_samples=3, num_keys=4, height=32, width=32)
    batches = list(pipeline.eval_clips(src, batch_size=2))
    assert len(batches) == 2
    np.testing.assert_array_equal(batches[0]["valid"], [True, True])
    np.testing.assert_array_equal(batches[1]["valid"], [True, False])


def test_transfer_u8_batch_matches_f32_path():
    """keep_u8 crops + on-device /255 == the host-normalized f32 path, and
    the RNG draw order is shared so the same seed picks the same crops."""
    import jax.numpy as jnp
    import numpy as np

    from bin_tpu.data.pipeline import SyntheticSource, train_iterator

    src = SyntheticSource(num_samples=4, num_keys=4, height=48, width=48,
                          seed=0, cache=True, as_u8=True)
    b_f32 = next(train_iterator(src, 2, (32, 32), seed=7, keep_u8=False))
    b_u8 = next(train_iterator(src, 2, (32, 32), seed=7, keep_u8=True))
    for k in b_f32:
        assert b_u8[k].dtype == np.uint8
        dev = np.asarray(jnp.asarray(b_u8[k]).astype(jnp.float32) / 255.0)
        np.testing.assert_allclose(dev, b_f32[k], atol=1e-6)
