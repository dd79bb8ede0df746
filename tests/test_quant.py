"""int8 PTQ conv path (ops/quant.py + model.conv_int8)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from bin_tpu.config import get_config
from bin_tpu.ops.quant import int8_conv, quantize_symmetric
from bin_tpu.registry import build_model


def test_quantize_symmetric_roundtrip():
    x = np.random.default_rng(0).normal(0, 1, (4, 8, 8, 16)).astype(np.float32)
    q, s = quantize_symmetric(jnp.asarray(x))
    err = np.abs(np.asarray(q, np.float32) * np.asarray(s) - x)
    assert err.max() <= float(np.abs(x).max()) / 127.0 + 1e-6
    qc, sc = quantize_symmetric(jnp.asarray(x), axis=(0, 1, 2))
    assert sc.shape == (1, 1, 1, 16)


def test_int8_conv_close_to_float():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.uniform(-1, 1, (2, 16, 16, 8)).astype(np.float32))
    k = jnp.asarray(rng.normal(0, 0.1, (3, 3, 8, 12)).astype(np.float32))
    b = jnp.asarray(rng.normal(0, 0.01, (12,)).astype(np.float32))
    ref = jax.lax.conv_general_dilated(
        x, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")) + b
    got = int8_conv(x, k, b)
    rel = float(jnp.max(jnp.abs(got - ref)) / jnp.max(jnp.abs(ref)))
    assert rel < 0.03, rel  # ~1% expected from 8-bit weights+activations


def _models():
    cfg_f = get_config("config3_prf", [
        "model.base_features=8", "model.num_res_blocks=1",
        "model.convlstm_features=16"])
    cfg_q = dataclasses.replace(
        cfg_f, model=dataclasses.replace(cfg_f.model, conv_int8=True))
    return build_model(cfg_f), build_model(cfg_q)


def test_param_tree_identical_and_checkpoint_compatible():
    """conv_int8 must not change the param tree: the flag is a pure
    inference A/B over existing checkpoints."""
    mf, mq = _models()
    pf = mf.init(jax.random.key(0), height=32, width=32)
    pq = mq.init(jax.random.key(0), height=32, width=32)
    assert (jax.tree_util.tree_structure(pf)
            == jax.tree_util.tree_structure(pq))
    for a, b in zip(jax.tree.leaves(pf), jax.tree.leaves(pq)):
        assert a.shape == b.shape and a.dtype == b.dtype
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_quantized_forward_close_to_float():
    mf, mq = _models()
    params = mf.init(jax.random.key(0), height=32, width=32)
    blurry = np.random.default_rng(2).uniform(
        0, 1, (1, 6, 32, 32, 3)).astype(np.float32)
    vf, _ = jax.jit(mf.infer_clip)(params, blurry)
    vq, _ = jax.jit(mq.infer_clip)(params, blurry)
    # zero-init tails make outputs ~= pair averages; PTQ noise rides on the
    # small learned residual, so outputs must stay visually identical
    err = float(jnp.max(jnp.abs(vf - vq)))
    assert err < 0.05, err
    psnr_delta = -10 * np.log10(float(jnp.mean((vf - vq) ** 2)) + 1e-12)
    assert psnr_delta > 35.0, psnr_delta  # int8-vs-float "PSNR" of outputs


def test_conv_int8_min_cin_scopes_quantization():
    """conv_int8_min_cin: a huge threshold disables quantization entirely
    (bit-identical to float); a mid threshold quantizes only the wide convs
    (differs from both float and all-int8); the param tree never changes."""
    cfg_f = get_config("config3_prf", [
        "model.base_features=8", "model.num_res_blocks=1",
        "model.convlstm_features=16"])
    mk = lambda **kw: build_model(dataclasses.replace(
        cfg_f, model=dataclasses.replace(cfg_f.model, **kw)))
    mf = mk()
    m_all = mk(conv_int8=True)
    m_off = mk(conv_int8=True, conv_int8_min_cin=10_000)
    m_mid = mk(conv_int8=True, conv_int8_min_cin=16)  # chans are 8,16,32
    params = mf.init(jax.random.key(0), height=32, width=32)
    # zero-init tails make the init-time output exactly the pair average,
    # which would mask quantization entirely — perturb all params
    leaves, treedef = jax.tree_util.tree_flatten(params)
    keys = jax.random.split(jax.random.key(1), len(leaves))
    params = jax.tree_util.tree_unflatten(treedef, [
        l + 0.02 * jax.random.normal(k, l.shape, l.dtype)
        for l, k in zip(leaves, keys)])
    blurry = jnp.asarray(np.random.default_rng(3).uniform(
        0, 1, (1, 6, 32, 32, 3)).astype(np.float32))
    vf = np.asarray(mf.infer_clip(params, blurry)[0])
    v_all = np.asarray(m_all.infer_clip(params, blurry)[0])
    v_off = np.asarray(m_off.infer_clip(params, blurry)[0])
    v_mid = np.asarray(m_mid.infer_clip(params, blurry)[0])
    np.testing.assert_array_equal(v_off, vf)        # threshold off == float
    assert np.abs(v_mid - vf).max() > 0             # mid threshold quantizes
    assert np.abs(v_mid - v_all).max() > 0          # ...but not everything
    # scoped quantization is at least as close to float as all-int8
    assert np.abs(v_mid - vf).mean() <= np.abs(v_all - vf).mean()


# ---- quantization-aware training (model.conv_int8_qat) ----------------------

def test_fake_quant_conv_matches_int8_conv_forward():
    """The QAT forward must simulate the deployed int8 path: same quantizer,
    fp32 vs int32 accumulation (exact at these widths)."""
    from bin_tpu.ops.quant import fake_quant_conv
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.uniform(-1, 1, (2, 12, 12, 8)).astype(np.float32))
    k = jnp.asarray(rng.normal(0, 0.1, (3, 3, 8, 12)).astype(np.float32))
    b = jnp.asarray(rng.normal(0, 0.01, (12,)).astype(np.float32))
    np.testing.assert_allclose(np.asarray(fake_quant_conv(x, k, b)),
                               np.asarray(int8_conv(x, k, b)),
                               rtol=0, atol=1e-5)


def test_fake_quant_straight_through_gradient():
    from bin_tpu.ops.quant import fake_quant
    x = jnp.asarray(np.random.default_rng(5).normal(
        0, 1, (6, 7)).astype(np.float32))
    g = jax.grad(lambda v: jnp.sum(fake_quant(v)))(x)
    np.testing.assert_array_equal(np.asarray(g), np.ones_like(x))
    # and through the conv twin: every input gets a finite, nonzero gradient
    from bin_tpu.ops.quant import fake_quant_conv
    k = jnp.asarray(np.random.default_rng(6).normal(
        0, 0.1, (3, 3, 4, 4)).astype(np.float32))
    xx = jnp.asarray(np.random.default_rng(7).uniform(
        -1, 1, (1, 8, 8, 4)).astype(np.float32))
    gx, gk = jax.grad(
        lambda a, w: jnp.sum(fake_quant_conv(a, w, None) ** 2),
        argnums=(0, 1))(xx, k)
    assert np.isfinite(np.asarray(gx)).all() and np.abs(gx).max() > 0
    assert np.isfinite(np.asarray(gk)).all() and np.abs(gk).max() > 0


def test_qat_model_forward_matches_deployed_int8():
    """Full model: the QAT training graph's forward must track the int8
    serving graph on the same params — what you train is what you ship."""
    cfg_f = get_config("config3_prf", [
        "model.base_features=8", "model.num_res_blocks=1",
        "model.convlstm_features=16"])
    mk = lambda **kw: build_model(dataclasses.replace(
        cfg_f, model=dataclasses.replace(cfg_f.model, **kw)))
    m_qat, m_int8 = mk(conv_int8_qat=True), mk(conv_int8=True)
    params = mk().init(jax.random.key(0), height=32, width=32)
    leaves, treedef = jax.tree_util.tree_flatten(params)
    keys = jax.random.split(jax.random.key(8), len(leaves))
    params = jax.tree_util.tree_unflatten(treedef, [
        l + 0.02 * jax.random.normal(k, l.shape, l.dtype)
        for l, k in zip(leaves, keys)])
    blurry = jnp.asarray(np.random.default_rng(9).uniform(
        0, 1, (1, 6, 32, 32, 3)).astype(np.float32))
    v_qat = np.asarray(m_qat.infer_clip(params, blurry)[0])
    v_int8 = np.asarray(m_int8.infer_clip(params, blurry)[0])
    v_f = np.asarray(mk().infer_clip(params, blurry)[0])
    assert np.abs(v_qat - v_int8).max() < 1e-4   # accum dtype only
    assert np.abs(v_qat - v_f).max() > 0         # and it IS quantized


def test_qat_train_step_learns():
    """conv_int8_qat must not change the param tree, and a few optimizer
    steps through the fake-quant graph must reduce the loss (STE gradients
    reach every quantized kernel)."""
    from bin_tpu.training.state import create_train_state
    from bin_tpu.training.trainer import make_train_step
    cfg = get_config("config3_prf", [
        "model.base_features=8", "model.num_res_blocks=1",
        "model.convlstm_features=16", "model.conv_int8_qat=true",
        "data.crop_size=32,32", "data.batch_size=2"])
    model = build_model(cfg)
    pf = build_model(dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, conv_int8_qat=False))).init(
            jax.random.key(0), height=32, width=32)
    pq = model.init(jax.random.key(0), height=32, width=32)
    assert (jax.tree_util.tree_structure(pf)
            == jax.tree_util.tree_structure(pq))

    from bin_tpu.data.pipeline import SyntheticSource, train_iterator
    state = create_train_state(cfg, model, jax.random.key(0))
    batch = next(train_iterator(SyntheticSource(2, 4, 48, 48, seed=0), 2,
                                (32, 32), seed=1, random_flip=False))
    step = jax.jit(make_train_step(model, cfg), donate_argnums=0)
    losses = []
    for _ in range(8):
        state, aux = step(state, batch)
        losses.append(float(aux["loss_total"]))
    assert all(np.isfinite(l) for l in losses)
    assert losses[-1] < losses[0], losses


def test_fake_quant_conv_bf16_inputs_match_int8_conv():
    """Under bf16 training the QAT forward must still track the deployed
    int8 path: quantization happens in fp32 and STAYS fp32 into the conv
    (a bf16 cast of the dequantized values would add rounding noise of the
    same order as the int8 step itself — review finding, round 3)."""
    from bin_tpu.ops.quant import fake_quant_conv
    rng = np.random.default_rng(10)
    x = jnp.asarray(rng.uniform(-1, 1, (2, 12, 12, 8)).astype(np.float32),
                    dtype=jnp.bfloat16)
    k = jnp.asarray(rng.normal(0, 0.1, (3, 3, 8, 12)).astype(np.float32),
                    dtype=jnp.bfloat16)
    b = jnp.asarray(rng.normal(0, 0.01, (12,)).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(fake_quant_conv(x, k, b), np.float32),
        np.asarray(int8_conv(x, k, b), np.float32), rtol=0, atol=1e-5)


def test_mse_clip_never_worse_than_absmax():
    """Per-channel MSE-clipped scales must not increase quantization MSE —
    c=1.0 (plain abs-max) is in the candidate set, so the search can only
    improve.  Strict improvement needs a LARGE fan-in with a lone outlier
    (at conv-sized fan-ins the outlier is a meaningful weight and the
    optimum often stays at c=1.0 — the measured reason the flag is not the
    serving default, BASELINE.md round 4)."""
    rng = np.random.default_rng(7)
    k = rng.normal(0, 0.05, (3, 3, 512, 4)).astype(np.float32)
    k[0, 0, 0, :] = 8 * 0.05 * 6  # one ~6-sigma-ish spike per channel, x8
    kj = jnp.asarray(k)

    def mse(mode):
        q, s = quantize_symmetric(kj, axis=(0, 1, 2), mse_clip=mode)
        dq = np.asarray(q, np.float32) * np.asarray(s)
        return float(np.mean((dq - k) ** 2))

    assert mse(True) <= mse(False) + 1e-12
    assert mse(True) < mse(False)  # strict with the planted outlier


def test_conv_int8_lstm_scopes_gate_conv():
    """model.conv_int8_lstm: same checkpoint, quantized gate conv only —
    param tree identical, flag off is bit-identical, cell-level output
    close to float.  Full-model quality at real scale is gated on-chip
    (the toy 16-feature cell has fan-in 216 vs 6912 in the flagship, so
    per-channel int8 noise here is ~5x larger and recurrence amplifies
    it — an end-to-end threshold at this size would test nothing)."""
    from bin_tpu.models.convlstm import ConvLSTMCell

    cfg = get_config("config3_prf", [
        "model.base_features=8", "model.num_res_blocks=1",
        "model.convlstm_features=16"])
    mk = lambda **kw: build_model(dataclasses.replace(
        cfg.model, **{"conv_int8": True, **kw}))
    m_f = build_model(cfg.model)
    m_i8 = mk()
    m_i8l = mk(conv_int8_lstm=True)
    p_f = m_f.init(jax.random.key(0), height=32, width=32)
    p_l = m_i8l.init(jax.random.key(0), height=32, width=32)
    assert (jax.tree_util.tree_structure(p_f)
            == jax.tree_util.tree_structure(p_l))
    for a, b in zip(jax.tree.leaves(p_f), jax.tree.leaves(p_l)):
        assert a.shape == b.shape
    # zero-init tails make init-time outputs exactly the pair average,
    # masking the LSTM path entirely — perturb params for the graph checks
    leaves, treedef = jax.tree_util.tree_flatten(p_f)
    keys = jax.random.split(jax.random.key(4), len(leaves))
    params = jax.tree_util.tree_unflatten(treedef, [
        l + 0.02 * jax.random.normal(k, l.shape, l.dtype)
        for l, k in zip(leaves, keys)])
    x = jnp.asarray(np.random.default_rng(5).uniform(
        0, 1, (1, 6, 32, 32, 3)).astype(np.float32))
    v_i8 = np.asarray(m_i8.infer_clip(params, x)[0])
    v_i8l = np.asarray(m_i8l.infer_clip(params, x)[0])
    assert np.abs(v_i8l - v_i8).max() > 0  # the flag changes the graph
    # conv_int8_lstm without conv_int8 is a no-op (scoping contract)
    m_off = build_model(dataclasses.replace(cfg.model, conv_int8_lstm=True))
    v_f = np.asarray(m_f.infer_clip(params, x)[0])
    np.testing.assert_array_equal(
        np.asarray(m_off.infer_clip(params, x)[0]), v_f)

    # cell-level closeness on realistic magnitudes
    rng = np.random.default_rng(0)
    cx = jnp.asarray(rng.normal(0, 3, (1, 8, 8, 24)).astype(np.float32))
    ch = jnp.asarray(np.tanh(rng.normal(0, 1, (1, 8, 8, 16))).astype(np.float32))
    cc = jnp.asarray(rng.normal(0, 1, (1, 8, 8, 16)).astype(np.float32))
    cell_f = ConvLSTMCell(features=16)
    cell_q = ConvLSTMCell(features=16, quant=True)
    pc = cell_f.init(jax.random.key(0), cx, (ch, cc))
    hf, cf = cell_f.apply(pc, cx, (ch, cc))
    hq, cq = cell_q.apply(pc, cx, (ch, cc))
    assert float(jnp.abs(hf - hq).max()) < 0.15
    assert float(jnp.abs(cf - cq).max()) < 0.2


def test_static_act_scales_calibrate_and_match_dynamic(tmp_path):
    """Full static-scale loop: calibration pass sows one abs-max per
    would-be-quantized conv (incl. the two ConvLSTM gate inputs), the
    scales file drives model.conv_int8_static, and the static graph's
    error vs fp32 stays in the same band as the dynamic-scale graph
    (when the calibration data covers the eval data, the static scale
    IS the dynamic scale's upper envelope)."""
    base = dict(dtype="float32", base_features=16, convlstm_features=32,
                conv_int8_min_cin=0)
    cfg = get_config("config3_prf")
    mk = lambda **kw: build_model(dataclasses.replace(
        cfg.model, **{**base, **kw}))
    m_cal = mk(conv_int8_calibrate=True)
    params = m_cal.init(jax.random.key(0), height=32, width=32)
    # zero-init tails mask the backbone at init — perturb for signal
    leaves, treedef = jax.tree_util.tree_flatten(params)
    keys = jax.random.split(jax.random.key(7), len(leaves))
    params = jax.tree_util.tree_unflatten(treedef, [
        l + 0.01 * jax.random.normal(k, l.shape, l.dtype)
        for l, k in zip(leaves, keys)])
    clip = jnp.asarray(np.random.default_rng(3).uniform(
        0, 1, (1, 6, 32, 32, 3)).astype(np.float32))

    k = cfg.model.window_size
    states = m_cal.initial_state(1, 32, 32)
    merged = None
    for s in range(clip.shape[1] - k + 1):
        (_, states), upd = m_cal.module.apply(
            {"params": params}, clip[:, s:s + k], states,
            producer_clamp=True, mutable=["quant_stats"])
        merged = upd["quant_stats"] if merged is None else jax.tree.map(
            jnp.maximum, merged, upd["quant_stats"])
    flat = jax.tree_util.tree_flatten_with_path(merged)[0]
    scales = {}
    for path, amax in flat:
        parts = [p.key for p in path]
        assert parts[-1].endswith("_amax")
        key = "/".join(parts[:-1] + [parts[-1][: -len("_amax")]])
        scales[key] = np.float32(max(float(amax), 1e-8) / 127.0)
    # every backbone conv + the two gate inputs of the one LSTM per level
    assert any(key.endswith("gates_x") for key in scales)
    assert any(key.endswith("gates_h") for key in scales)
    assert any("mid_0/Conv_0" in key for key in scales)
    out = tmp_path / "scales.npz"
    np.savez(out, **scales)

    m_f = mk()
    m_dyn = mk(conv_int8=True, conv_int8_lstm=True)
    m_sta = mk(conv_int8=True, conv_int8_lstm=True,
               conv_int8_static=str(out))
    v_f = np.asarray(m_f.infer_clip(params, clip)[0])
    v_dyn = np.asarray(m_dyn.infer_clip(params, clip)[0])
    v_sta = np.asarray(m_sta.infer_clip(params, clip)[0])
    assert np.abs(v_sta - v_f).mean() <= 2.0 * np.abs(v_dyn - v_f).mean() + 1e-6
    # param tree untouched (pure serving flag over existing checkpoints)
    p2 = m_sta.init(jax.random.key(0), height=32, width=32)
    assert (jax.tree_util.tree_structure(p2)
            == jax.tree_util.tree_structure(params))


def test_int8_conv_static_scale_matches_dynamic_at_true_amax():
    """With act_scale set to the tensor's true abs-max / 127, the static
    path is BIT-identical to the dynamic path (same grid, no clipping)."""
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(0, 1, (1, 16, 16, 8)).astype(np.float32))
    k = jnp.asarray(rng.normal(0, 0.1, (3, 3, 8, 12)).astype(np.float32))
    b = jnp.asarray(rng.normal(0, 0.1, (12,)).astype(np.float32))
    scale = float(jnp.max(jnp.abs(x))) / 127.0
    np.testing.assert_array_equal(
        np.asarray(int8_conv(x, k, b)),
        np.asarray(int8_conv(x, k, b, act_scale=scale)))


def test_lookup_act_scale_missing_key_remediation():
    """Both consumers (backbone ConvBlock and the ConvLSTM gate convs) go
    through ONE strict lookup whose error names the missing conv and the
    re-calibration remediation — a sidecar calibrated against a different
    architecture/scope must fail loudly, not fall back to dynamic scales."""
    import pytest

    from bin_tpu.ops.quant import lookup_act_scale

    scales = {"level_1/enc_0/Conv_0": 0.01}
    assert lookup_act_scale(scales, "level_1/enc_0/Conv_0") == 0.01
    with pytest.raises(KeyError, match="calibrate_int8"):
        lookup_act_scale(scales, "level_1/mid_4/Conv_0")


def test_scales_sidecar_provenance_metadata(tmp_path):
    """__calibrated_for__ metadata rides the sidecar (written by
    tools/calibrate_int8.py), is readable via scales_calibrated_for, and is
    SKIPPED by load_act_scales (it is not a conv scale)."""
    from bin_tpu.ops.quant import load_act_scales, scales_calibrated_for

    p = tmp_path / "rel.scales.npz"
    np.savez(p, __calibrated_for__=np.str_("rel.npz"),
             **{"level_1/enc_0/Conv_0": np.float32(0.02)})
    assert scales_calibrated_for(str(p)) == "rel.npz"
    scales = load_act_scales(str(p))
    assert scales == {"level_1/enc_0/Conv_0": np.float32(0.02)}
    # pre-provenance sidecar: no metadata -> None
    q = tmp_path / "old.scales.npz"
    np.savez(q, **{"level_1/enc_0/Conv_0": np.float32(0.02)})
    assert scales_calibrated_for(str(q)) is None
