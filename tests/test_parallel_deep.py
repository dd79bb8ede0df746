"""Deeper multi-chip validation on the 8-fake-CPU mesh (VERDICT r2 item 4):
multi-step sharded convergence, sharded eval/streaming vs single-device,
stem-4 spatial sharding at 720-height (uneven bottleneck split), and
explicit grain input sharding."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bin_tpu.config import ParallelConfig, get_config
from bin_tpu.data.pipeline import SyntheticSource, train_iterator
from bin_tpu.parallel.mesh import make_mesh, replicated, shard_batch
from bin_tpu.registry import build_model
from bin_tpu.training.state import create_train_state
from bin_tpu.training.trainer import make_train_step


def _tiny(cfg, batch=8, seq=4):
    return dataclasses.replace(
        cfg,
        model=dataclasses.replace(cfg.model, base_features=8,
                                  num_res_blocks=1, convlstm_features=16),
        data=dataclasses.replace(cfg.data, crop_size=(32, 32),
                                 batch_size=batch, seq_len=seq),
    )


def test_multistep_sharded_training_converges(devices):
    """10 DP steps on a fixed batch must drive the loss down — the sharded
    gradient all-reduce and update are really training, not just finite."""
    cfg = _tiny(get_config("config3_prf"), batch=8)
    model = build_model(cfg)
    plan = make_mesh(ParallelConfig(data_axis_size=-1))
    state = replicated(plan, create_train_state(cfg, model, jax.random.key(0)))
    src = SyntheticSource(4, 4, 48, 48, seed=0)
    batch = shard_batch(plan, next(
        train_iterator(src, 8, (32, 32), seed=1, random_flip=False)))
    step = make_train_step(model, cfg, plan)
    losses = []
    for _ in range(10):
        state, aux = step(state, batch)
        losses.append(float(aux["loss_total"]))
    assert all(np.isfinite(l) for l in losses)
    assert losses[-1] < losses[0], losses


def test_sharded_eval_matches_single_device(devices):
    """clip_metrics_fn over a data-sharded clip batch == single-device."""
    from bin_tpu.evaluation.evaluator import clip_metrics_fn

    cfg = _tiny(get_config("config3_prf"))
    model = build_model(cfg)
    params = model.init(jax.random.key(1), height=32, width=32)
    rng = np.random.default_rng(3)
    k = 6
    blurry = rng.uniform(0, 1, (8, k, 32, 32, 3)).astype(np.float32)
    sharp = rng.uniform(0, 1, (8, 2 * k - 1, 32, 32, 3)).astype(np.float32)
    fn, _times = clip_metrics_fn(model, k)

    ref = jax.device_get(fn(params, blurry, sharp))

    plan = make_mesh(ParallelConfig(data_axis_size=-1))
    params_rep = replicated(plan, params)
    sharded = jax.device_get(fn(
        params_rep,
        jax.device_put(blurry, plan.batch(5)),
        jax.device_put(sharp, plan.batch(5))))
    for metric in ("psnr", "ssim"):
        for cat in ("deblur", "interp", "overall"):
            np.testing.assert_allclose(sharded[metric][cat], ref[metric][cat],
                                       rtol=1e-5, atol=1e-6)


def test_sharded_streaming_matches_single_device(devices):
    """StreamingSession with the stream axis sharded over 'data' must emit
    the same frames as the unsharded session (multi-chip serving path)."""
    from bin_tpu.evaluation.streaming import StreamingSession

    cfg = _tiny(get_config("config3_prf"))
    model = build_model(cfg)
    params = model.init(jax.random.key(2), height=32, width=32)
    rng = np.random.default_rng(7)
    keys = rng.uniform(0, 1, (7, 8, 32, 32, 3)).astype(np.float32)

    single = StreamingSession(model, params, batch=8, height=32, width=32,
                              buffer_drain=True)
    plan = make_mesh(ParallelConfig(data_axis_size=-1))
    sharded = StreamingSession(model, params, batch=8, height=32, width=32,
                               buffer_drain=True, plan=plan)
    for sess in (single, sharded):
        for i in range(keys.shape[0]):
            sess.push(keys[i])
        sess.flush()
    out_a = single.drain()
    out_b = sharded.drain()
    assert [t for t, _ in out_a] == [t for t, _ in out_b]
    for (ta, fa), (tb, fb) in zip(out_a, out_b):
        np.testing.assert_allclose(fa, fb, rtol=1e-5, atol=1e-5)


def test_sharded_streaming_rejects_uneven_batch(devices):
    from bin_tpu.evaluation.streaming import StreamingSession

    cfg = _tiny(get_config("config3_prf"))
    model = build_model(cfg)
    params = model.init(jax.random.key(2), height=32, width=32)
    plan = make_mesh(ParallelConfig(data_axis_size=-1))
    with pytest.raises(ValueError, match="divide"):
        StreamingSession(model, params, batch=6, height=32, width=32, plan=plan)


def test_spatial_sharded_stem4_720_height(devices):
    """Spatial (height) sharding with the flagship's stem_factor=4 at real
    720p height: packed H = 720/4 = 180 splits 90/90, but the bottleneck
    H = 45 splits UNEVENLY (23/22) — the halo/padding edge case the tiny
    32x32 dryrun could never hit (VERDICT r2 weak #7)."""
    cfg = get_config("config5_v5e_streaming", [
        "model.base_features=8", "model.num_res_blocks=1",
        "model.convlstm_features=16", "model.dtype=float32",
    ])
    model = build_model(cfg)
    params = model.init(jax.random.key(0), height=64, width=64)
    window = jnp.asarray(np.random.default_rng(0)
                         .uniform(0, 1, (2, 4, 720, 256, 3))
                         .astype(np.float32))
    states = model.initial_state(2, 720, 256)

    ref_outs, ref_states = jax.jit(model.apply_window)(params, window, states)

    plan = make_mesh(ParallelConfig(data_axis_size=2, spatial_axis_size=2))
    params_rep = replicated(plan, params)
    win_sh = jax.device_put(window, plan.batch(5, batch_dim=0, height_dim=2))
    # ConvLSTM carries shard over 'data' ONLY: their height is the bottleneck
    # resolution (720/4/4 = 45), which does NOT divide over spatial=2 —
    # device_put of inputs requires even splits, while XLA pads uneven
    # shardings internally on its own. This asymmetry is exactly the
    # stem-4@720p edge case this test exists for.
    states_sh = jax.tree.map(
        lambda x: jax.device_put(x, plan.batch(x.ndim, batch_dim=0)), states)
    sh_outs, sh_states = jax.jit(model.apply_window)(params_rep, win_sh,
                                                     states_sh)
    for a, b in zip(ref_outs, sh_outs):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)
    for (ha, ca), (hb, cb) in zip(ref_states, sh_states):
        np.testing.assert_allclose(np.asarray(ha), np.asarray(hb),
                                   rtol=2e-4, atol=2e-5)


def test_grain_shard_split_disjoint_and_complete():
    """Explicit 2-way grain sharding: the two shards' record streams are
    disjoint and together cover every record exactly once per epoch (the
    single-process stand-in for ShardByJaxProcess — same ShardOptions
    mechanism, index picked by the caller)."""
    from bin_tpu.data.grain_pipeline import grain_train_iterator

    class IdSource:
        """Each record is a constant array carrying its own id."""

        def __len__(self):
            return 16

        def __getitem__(self, i):
            return {
                "blurry": np.full((4, 40, 40, 3), i, np.float32),
                "sharp": np.full((7, 40, 40, 3), i, np.float32),
            }

    def ids_of(shard_index):
        it = grain_train_iterator(IdSource(), batch_size=1, crop_size=(32, 32),
                                  seed=5, random_flip=False, num_epochs=1,
                                  shard_index=shard_index, shard_count=2)
        return [int(b["blurry"].flat[0]) for b in it]

    a, b = ids_of(0), ids_of(1)
    assert len(a) == 8 and len(b) == 8
    assert not set(a) & set(b), (a, b)
    assert set(a) | set(b) == set(range(16))


def test_spatial_sharded_streaming_matches_single_device(devices):
    """StreamingSession over a data=2 x spatial=4 mesh: streams sharded over
    'data' AND activation height over 'spatial' (the single-stream latency
    lever — XLA inserts conv halo exchanges) must emit the same frames as
    the unsharded session."""
    from bin_tpu.evaluation.streaming import StreamingSession

    cfg = _tiny(get_config("config3_prf"))
    model = build_model(cfg)
    params = model.init(jax.random.key(2), height=64, width=32)
    rng = np.random.default_rng(8)
    keys = rng.uniform(0, 1, (6, 2, 64, 32, 3)).astype(np.float32)

    single = StreamingSession(model, params, batch=2, height=64, width=32,
                              buffer_drain=True)
    plan = make_mesh(ParallelConfig(data_axis_size=2, spatial_axis_size=4))
    sharded = StreamingSession(model, params, batch=2, height=64, width=32,
                               buffer_drain=True, plan=plan)
    for sess in (single, sharded):
        for i in range(keys.shape[0]):
            sess.push(keys[i])
        sess.flush()
    out_a, out_b = single.drain(), sharded.drain()
    assert [t for t, _ in out_a] == [t for t, _ in out_b]
    for (ta, fa), (tb, fb) in zip(out_a, out_b):
        np.testing.assert_allclose(fa, fb, rtol=1e-5, atol=1e-5)


def test_spatial_sharded_streaming_rejects_indivisible_height(devices):
    from bin_tpu.evaluation.streaming import StreamingSession

    cfg = _tiny(get_config("config3_prf"))
    model = build_model(cfg)
    params = model.init(jax.random.key(2), height=32, width=32)
    plan = make_mesh(ParallelConfig(data_axis_size=2, spatial_axis_size=4))
    import pytest as _pytest
    with _pytest.raises(ValueError, match="spatial"):
        # packed height 36/2=18 does not divide over spatial=4
        StreamingSession(model, params, batch=2, height=36, width=32,
                         plan=plan)


def test_evaluate_cli_mesh_matches_single_device(devices):
    """evaluate_cli with a parallel mesh config (clips over 'data', height
    over 'spatial') must reproduce the single-device protocol numbers."""
    from bin_tpu.evaluation.evaluator import evaluate_cli

    overrides = ["model.base_features=8", "model.num_res_blocks=1",
                 "model.convlstm_features=16", "data.eval_size=32,32",
                 "data.eval_num_clips=6", "data.eval_num_keys=6",
                 "model.dtype=float32"]
    single = evaluate_cli(get_config("config3_prf", overrides))
    meshed = evaluate_cli(get_config(
        "config3_prf", overrides + ["parallel.data_axis_size=4",
                                    "parallel.spatial_axis_size=2"]))
    assert sorted(single) == sorted(meshed)
    for k in single:
        np.testing.assert_allclose(meshed[k], single[k], rtol=1e-5,
                                   atol=1e-6)


def test_spatial_streaming_indivisible_carry_height(devices):
    """REGRESSION (review, round 3): height 48 passes the stem-packed guard
    (48/2=24 divides 4) but the bottleneck ConvLSTM carries are 48/8=6 high
    — NOT divisible by spatial=4.  MeshPlan.activation must leave such
    arrays replicated along 'spatial' instead of crashing device_put, and
    the outputs must still match the unsharded session."""
    from bin_tpu.evaluation.streaming import StreamingSession

    cfg = _tiny(get_config("config3_prf"))
    model = build_model(cfg)
    params = model.init(jax.random.key(2), height=48, width=32)
    rng = np.random.default_rng(9)
    keys = rng.uniform(0, 1, (6, 2, 48, 32, 3)).astype(np.float32)

    single = StreamingSession(model, params, batch=2, height=48, width=32,
                              buffer_drain=True)
    plan = make_mesh(ParallelConfig(data_axis_size=2, spatial_axis_size=4))
    sharded = StreamingSession(model, params, batch=2, height=48, width=32,
                               buffer_drain=True, plan=plan)
    for sess in (single, sharded):
        for i in range(keys.shape[0]):
            sess.push(keys[i])
        sess.flush()
    out_a, out_b = single.drain(), sharded.drain()
    assert [t for t, _ in out_a] == [t for t, _ in out_b]
    for (_, fa), (_, fb) in zip(out_a, out_b):
        np.testing.assert_allclose(fa, fb, rtol=1e-5, atol=1e-5)
