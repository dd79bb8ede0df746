"""Model stack tests: backbone, ConvLSTM, pyramid wiring, scan recurrence."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bin_tpu.config import ModelConfig
from bin_tpu.models.backbone import Backbone
from bin_tpu.models.convlstm import ConvLSTMCell, init_state
from bin_tpu.models.pyramid import level_output_times, total_levels
from bin_tpu.models import recurrent
from bin_tpu.registry import build_model

SMALL = ModelConfig(name="prf", base_features=8, channel_mult=(1, 2, 4),
                    num_res_blocks=1, convlstm_features=16, stem_factor=1)


def _rand(*shape, seed=0):
    return jnp.asarray(
        np.random.default_rng(seed).uniform(0, 1, shape).astype(np.float32))


def _open_tails(params, scale=0.01):
    """Give the zero-init'd tail convs weight so internal signals (context,
    ConvLSTM state) become observable at the sharp outputs."""
    return jax.tree_util.tree_map_with_path(
        lambda path, x: jnp.ones_like(x) * scale
        if any(getattr(p, "key", None) == "tail" for p in path) else x, params)


# -- backbone ----------------------------------------------------------------

def test_backbone_shapes():
    m = Backbone(base_features=8, num_res_blocks=1)
    a, b = _rand(2, 32, 48, 3), _rand(2, 32, 48, 3, seed=1)
    params = m.init(jax.random.key(0), a, b)
    sharp, feats = m.apply(params, a, b)
    assert sharp.shape == (2, 32, 48, 3)
    assert feats.shape == (2, 8, 12, 32)  # H/4, W/4, 4*base
    assert sharp.dtype == jnp.float32


def test_backbone_context_changes_output():
    m = Backbone(base_features=8, num_res_blocks=1)
    a, b = _rand(1, 32, 32, 3), _rand(1, 32, 32, 3, seed=1)
    ctx = _rand(1, 8, 8, 16, seed=2)
    params = _open_tails(m.init(jax.random.key(0), a, b, ctx))
    out0, f0 = m.apply(params, a, b, jnp.zeros_like(ctx))
    out1, f1 = m.apply(params, a, b, ctx)
    assert not np.allclose(f0, f1)
    assert not np.allclose(out0, out1)


def test_backbone_gradients_flow():
    m = Backbone(base_features=8, num_res_blocks=1)
    a, b = _rand(1, 16, 16, 3), _rand(1, 16, 16, 3, seed=1)
    params = m.init(jax.random.key(0), a, b)

    def loss(p):
        out, _ = m.apply(p, a, b)
        return jnp.mean(out ** 2)

    grads = jax.grad(loss)(params)
    norms = [float(jnp.linalg.norm(g)) for g in jax.tree.leaves(grads)]
    assert all(np.isfinite(norms))
    assert max(norms) > 0


# -- ConvLSTM ----------------------------------------------------------------

def test_convlstm_state_update_and_shapes():
    cell = ConvLSTMCell(features=16)
    x = _rand(2, 8, 8, 32)
    state = init_state(2, 8, 8, 16)
    params = cell.init(jax.random.key(0), x, state)
    h1, c1 = cell.apply(params, x, state)
    assert h1.shape == (2, 8, 8, 16) and c1.shape == (2, 8, 8, 16)
    # state must evolve when reapplied
    h2, c2 = cell.apply(params, x, (h1, c1))
    assert not np.allclose(h1, h2)
    # tanh-bounded hidden state
    assert float(jnp.max(jnp.abs(h1))) <= 1.0


# -- pyramid wiring ----------------------------------------------------------

def test_level_output_times_reference_wiring():
    # SURVEY.md §4.4: K=4 → L1 times (1,3,5), L2 (2,4), L3 (3)
    assert level_output_times(1, 4) == [1, 3, 5]
    assert level_output_times(2, 4) == [2, 4]
    assert level_output_times(3, 4) == [3]


def test_total_levels_validation():
    with pytest.raises(ValueError):
        total_levels(dataclasses.replace(SMALL, num_levels=3, window_size=4))


@pytest.mark.parametrize("name,levels", [("backbone", 1), ("pyramid", 3), ("prf", 3)])
def test_pyramid_output_shapes(name, levels):
    model = build_model(dataclasses.replace(SMALL, name=name))
    assert model.num_levels_total == levels
    params = model.init(jax.random.key(0), batch=2, height=32, width=32)
    window = _rand(2, 4, 32, 32, 3)
    states = model.initial_state(2, 32, 32)
    outputs, new_states = model.apply_window(params, window, states)
    assert len(outputs) == levels
    for li, out in enumerate(outputs):
        assert out.shape == (2, 3 - li, 32, 32, 3)
    if name == "prf":
        assert len(new_states) == levels
        assert new_states[0][0].shape == (2, 8, 8, 16)
    else:
        assert new_states == []


def test_identity_on_static_sharp_input():
    """With zero-init tail convs? No — just sanity: output near input average
    at init (residual design keeps init predictions in-range)."""
    model = build_model(dataclasses.replace(SMALL, name="pyramid"))
    params = model.init(jax.random.key(0), batch=1, height=32, width=32)
    window = jnp.broadcast_to(_rand(1, 1, 32, 32, 3), (1, 4, 32, 32, 3))
    outputs, _ = model.apply_window(params, window, [])
    # residual-around-average design: initial prediction close to the input
    assert float(jnp.mean(jnp.abs(outputs[0] - window[:, :1]))) < 0.5


def test_pixel_shuffle_roundtrip_and_layout():
    from bin_tpu.ops.pixel_shuffle import depth_to_space, space_to_depth
    x = _rand(2, 8, 12, 3)
    for f in (1, 2, 4):
        y = space_to_depth(x, f)
        assert y.shape == (2, 8 // f, 12 // f, 3 * f * f)
        np.testing.assert_array_equal(np.asarray(depth_to_space(y, f)),
                                      np.asarray(x))
    # pixel-major layout: channel block (dy*f+dx) holds pixel (dy, dx)
    y = np.asarray(space_to_depth(x, 2))
    np.testing.assert_array_equal(y[0, 0, 0, 3:6], np.asarray(x)[0, 0, 1])


def test_space_to_depth_conv_bit_exact():
    """The one-hot-conv pack equals the reshape/transpose pack BIT-exactly
    (each output sums exactly one nonzero tap) at fp32 AND bf16, with and
    without leading batch/key dims."""
    from bin_tpu.ops.pixel_shuffle import space_to_depth, space_to_depth_conv
    for shape in [(2, 3, 16, 24, 3), (4, 8, 12, 3)]:
        for dtype in (jnp.float32, jnp.bfloat16):
            x = _rand(*shape).astype(dtype)
            for f in (1, 2, 4):
                np.testing.assert_array_equal(
                    np.asarray(space_to_depth_conv(x, f)),
                    np.asarray(space_to_depth(x, f)))


def test_depth_to_space_conv_bit_exact():
    """The one-hot transposed-conv unpack equals the reshape/moveaxis
    depth_to_space BIT-exactly (each output is the dot of a single 1.0 tap
    with its source element) at fp32 AND bf16, with leading dims."""
    from bin_tpu.ops.pixel_shuffle import depth_to_space, depth_to_space_conv
    for shape in [(2, 3, 8, 12, 48), (3, 8, 12, 16)]:
        for dtype in (jnp.float32, jnp.bfloat16):
            x = _rand(*shape).astype(dtype)
            for f in (1, 2, 4):
                np.testing.assert_array_equal(
                    np.asarray(depth_to_space_conv(x, f)),
                    np.asarray(depth_to_space(x, f)))


def test_d2s_via_conv_model_flag_exact():
    """model.d2s_via_conv (decoder upsample interleave as transposed conv —
    the round-4 layout-thrash fix, default ON since the +26.9% fps
    measurement) is a pure layout A/B: identical outputs, identical param
    tree."""
    cfg = dataclasses.replace(SMALL, stem_factor=2, d2s_via_conv=False)
    model = build_model(cfg)
    params = model.init(jax.random.key(0), batch=1, height=32, width=32)
    window = _rand(1, 4, 32, 32, 3)
    states = model.initial_state(1, 32, 32)
    outs_a, _ = model.apply_window(params, window, states)
    model_b = build_model(dataclasses.replace(cfg, d2s_via_conv=True))
    outs_b, _ = model_b.apply_window(params, window, states)
    for a, b in zip(outs_a, outs_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_s2d_via_conv_model_flag_exact():
    """model.s2d_via_conv is a pure layout A/B: identical outputs."""
    cfg = dataclasses.replace(SMALL, stem_factor=2)
    model = build_model(cfg)
    params = model.init(jax.random.key(0), batch=1, height=32, width=32)
    window = _rand(1, 4, 32, 32, 3)
    states = model.initial_state(1, 32, 32)
    outs_a, _ = model.apply_window(params, window, states)
    model_b = build_model(dataclasses.replace(cfg, s2d_via_conv=True))
    outs_b, _ = model_b.apply_window(params, window, states)
    for a, b in zip(outs_a, outs_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_stem_factor_shapes():
    """stem_factor=2: the pyramid runs fully packed; unpack restores I/O."""
    cfg = dataclasses.replace(SMALL, stem_factor=2)
    model = build_model(cfg)
    params = model.init(jax.random.key(0), batch=1, height=32, width=32)
    window = _rand(1, 4, 32, 32, 3)
    states = model.initial_state(1, 32, 32)
    assert states[0][0].shape == (1, 4, 4, 16)  # 32 / (2*4)
    outputs, _ = model.apply_window(params, window, states)
    assert outputs[0].shape == (1, 3, 16, 16, 12)  # packed domain
    unpacked = model.unpack(outputs[0])
    assert unpacked.shape == (1, 3, 32, 32, 3)
    # zero-init tail: init prediction equals the pair average exactly
    avg = 0.5 * (window[:, :-1] + window[:, 1:])
    np.testing.assert_allclose(np.asarray(unpacked), np.asarray(avg),
                               atol=1e-6)
    # end-to-end: infer_clip returns full-resolution fp32 video
    clip = _rand(1, 5, 32, 32, 3, seed=9)
    video, times = model.infer_clip(params, clip)
    assert video.shape == (1, len(times), 32, 32, 3)
    assert video.dtype == jnp.float32


# -- recurrence --------------------------------------------------------------

def test_scan_windows_shapes_and_state_propagation():
    model = build_model(SMALL)
    params = _open_tails(model.init(jax.random.key(0), batch=1, height=32, width=32))
    blurry = _rand(1, 6, 32, 32, 3)  # 6 keys → 3 windows
    outputs, final_states = model.forward_clip(params, blurry)
    assert outputs[0].shape == (3, 1, 3, 32, 32, 3)
    assert outputs[2].shape == (3, 1, 1, 32, 32, 3)
    assert float(jnp.linalg.norm(final_states[0][0])) > 0  # state evolved

    # recurrence must matter: zero-state single-window output differs from
    # the scanned third window (which has accumulated history)
    single, _ = model.apply_window(params, blurry[:, 2:6],
                                   model.initial_state(1, 32, 32))
    assert not np.allclose(single[2], outputs[2][2], atol=1e-5)


def test_clip_loss_finite_and_differentiable():
    from bin_tpu.config import LossConfig
    model = build_model(SMALL)
    params = model.init(jax.random.key(0), batch=1, height=32, width=32)
    blurry = _rand(1, 5, 32, 32, 3)
    sharp = _rand(1, 9, 32, 32, 3, seed=1)
    lcfg = LossConfig()

    def loss_fn(p):
        loss, aux = model.loss_clip(p, blurry, sharp, lcfg)
        return loss, aux

    (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
    assert np.isfinite(float(loss))
    assert "loss_cycle" in aux and "loss_level1" in aux
    gnorm = jnp.sqrt(sum(jnp.sum(g ** 2) for g in jax.tree.leaves(grads)))
    assert np.isfinite(float(gnorm)) and float(gnorm) > 0


# -- assembly ----------------------------------------------------------------

def test_assembly_plan_coverage_and_depth():
    plan = recurrent.assembly_plan(num_keys=6, window_size=4, levels=3)
    # all interior times covered
    assert sorted(plan) == list(range(1, 10))
    # interior odd times come from the cycle level (deepest), parity matches
    assert plan[5][0] == 2
    # even times from level 2
    assert all(plan[t][0] == 1 for t in (2, 4, 6, 8))
    # edge odd times fall back to level 1
    assert plan[1][0] in (0, 2)
    for t, (li, s, j) in plan.items():
        # consistency: t = 2s + level + 2j
        assert t == 2 * s + (li + 1) + 2 * j


def test_assemble_clip_shapes():
    model = build_model(SMALL)
    params = model.init(jax.random.key(0), batch=1, height=32, width=32)
    blurry = _rand(1, 6, 32, 32, 3)
    video, times = model.infer_clip(params, blurry)
    assert video.shape == (1, len(times), 32, 32, 3)
    assert times.tolist() == list(range(1, 10))


def test_d2s_final_via_conv_exact():
    """model.d2s_final_via_conv (the FINAL assemble/unpack in one-hot conv
    form — the round-5 attack on the copy.382/copy.381 output-assembly
    pool) is a pure layout A/B: infer_clip and Model.unpack are bit-exact
    across the tri-state, and "follow" tracks d2s_via_conv.  The chip A/B
    (runs/r5_final_unpack/VERDICT.json) read within noise, so the shipped
    default is the reshape form ("false")."""
    from bin_tpu.ops.pixel_shuffle import final_unpack_via_conv

    base = dataclasses.replace(SMALL, stem_factor=2, dtype="bfloat16")
    assert not final_unpack_via_conv(base)  # shipped default: reshape form
    assert (final_unpack_via_conv(
        dataclasses.replace(base, d2s_final_via_conv="follow"))
        == base.d2s_via_conv)
    assert final_unpack_via_conv(
        dataclasses.replace(base, d2s_final_via_conv="true"))
    assert not final_unpack_via_conv(
        dataclasses.replace(base, d2s_final_via_conv="false"))
    with pytest.raises(ValueError, match="d2s_final_via_conv"):
        # a typo'd A/B pin must fail loudly, not silently measure "follow"
        final_unpack_via_conv(
            dataclasses.replace(base, d2s_final_via_conv="ture"))

    clip = _rand(1, 5, 32, 32, 3, seed=11)
    model_a = build_model(dataclasses.replace(base, d2s_final_via_conv="false"))
    params = model_a.init(jax.random.key(0), batch=1, height=32, width=32)
    vid_a, times_a = model_a.infer_clip(params, clip)
    model_b = build_model(dataclasses.replace(base, d2s_final_via_conv="true"))
    vid_b, times_b = model_b.infer_clip(params, clip)
    assert vid_a.dtype == vid_b.dtype == jnp.float32
    np.testing.assert_array_equal(np.asarray(times_a), np.asarray(times_b))
    np.testing.assert_array_equal(np.asarray(vid_a), np.asarray(vid_b))

    packed = _rand(2, 3, 8, 8, 12, seed=12).astype(jnp.bfloat16)
    np.testing.assert_array_equal(np.asarray(model_a.unpack(packed)),
                                  np.asarray(model_b.unpack(packed)))
