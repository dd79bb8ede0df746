"""Multi-device sharding tests on the 8-fake-CPU-device mesh (SURVEY.md §5:
replaces the reference's nonexistent distributed tests)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from bin_tpu.config import ParallelConfig, get_config
from bin_tpu.data.pipeline import SyntheticSource, train_iterator
from bin_tpu.parallel.mesh import make_mesh, replicated, shard_batch
from bin_tpu.registry import build_model
from bin_tpu.training.state import create_train_state
from bin_tpu.training.trainer import make_train_step


def _tiny(cfg, batch=8):
    return dataclasses.replace(
        cfg,
        model=dataclasses.replace(cfg.model, base_features=8,
                                  num_res_blocks=1, convlstm_features=16),
        data=dataclasses.replace(cfg.data, crop_size=(32, 32), batch_size=batch,
                                 seq_len=4),
    )


def test_mesh_construction(devices):
    plan = make_mesh(ParallelConfig(data_axis_size=-1))
    assert plan.num_data == 8 and plan.num_spatial == 1
    plan2 = make_mesh(ParallelConfig(data_axis_size=4, spatial_axis_size=2))
    assert plan2.num_data == 4 and plan2.num_spatial == 2


def test_shard_batch_layout(devices):
    plan = make_mesh(ParallelConfig(data_axis_size=-1))
    batch = {"x": np.zeros((8, 4, 16, 16, 3), np.float32)}
    sharded = shard_batch(plan, batch)
    assert len(sharded["x"].sharding.device_set) == 8
    # leading dim split 8 ways
    shard_shape = sharded["x"].sharding.shard_shape(sharded["x"].shape)
    assert shard_shape[0] == 1


def test_data_parallel_step_matches_single_device(devices):
    """DP gradient step over 8 devices must equal the single-device step —
    the SPMD correctness contract of the mesh design (SURVEY.md §6.8)."""
    cfg = _tiny(get_config("config3_prf"), batch=8)
    model = build_model(cfg)
    state = create_train_state(cfg, model, jax.random.key(0))
    src = SyntheticSource(4, 4, 48, 48, seed=0)
    batch = next(train_iterator(src, 8, (32, 32), seed=1, random_flip=False))

    step_single = make_train_step(model, cfg)
    new_single, aux_single = step_single(
        jax.tree.map(jnp.copy, state), jax.tree.map(jnp.asarray, batch))

    plan = make_mesh(ParallelConfig(data_axis_size=-1))
    step_dp = make_train_step(model, cfg, plan)
    state_dp = replicated(plan, jax.tree.map(jnp.copy, state))
    new_dp, aux_dp = step_dp(state_dp, shard_batch(plan, batch))

    np.testing.assert_allclose(float(aux_single["loss_total"]),
                               float(aux_dp["loss_total"]), rtol=1e-5)
    leaves_s = jax.tree.leaves(new_single.params)
    leaves_d = jax.tree.leaves(new_dp.params)
    for a, b in zip(leaves_s, leaves_d):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-6)


def test_spatial_sharding_forward(devices):
    """Height-sharded forward (conv halo exchange by XLA) must match the
    replicated forward."""
    cfg = _tiny(get_config("config2_pyramid"))
    model = build_model(cfg)
    params = model.init(jax.random.key(0), batch=1, height=32, width=32)
    window = jnp.asarray(
        np.random.default_rng(0).uniform(0, 1, (2, 4, 32, 32, 3)).astype(np.float32))

    outs_ref, _ = jax.jit(model.apply_window)(params, window, [])

    plan = make_mesh(ParallelConfig(data_axis_size=2, spatial_axis_size=4))
    win_sharded = jax.device_put(window, plan.batch(5, batch_dim=0, height_dim=2))
    params_rep = replicated(plan, params)
    outs_sh, _ = jax.jit(model.apply_window)(params_rep, win_sharded, [])
    for a, b in zip(outs_ref, outs_sh):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)
