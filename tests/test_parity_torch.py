"""Golden-value parity: flax model vs the PyTorch CPU twin (same weights →
same outputs to fp32 tolerance).  Pins conv padding, bilinear resize, gate
order and pair-batching conventions (SURVEY.md §5, §8 stage 3)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bin_tpu.config import ModelConfig
from bin_tpu.models.backbone import Backbone
from bin_tpu.models.convlstm import ConvLSTMCell, init_state
from bin_tpu.registry import build_model

import torch_twin as twin

CFG = ModelConfig(name="prf", base_features=8, channel_mult=(1, 2, 4),
                  num_res_blocks=1, convlstm_features=16, stem_factor=1)


def _rand(*shape, seed=0, scale=1.0):
    return (np.random.default_rng(seed)
            .uniform(0, scale, shape).astype(np.float32))


def _randomize(params, seed=7):
    """Replace params (incl. zero-init tails) with small random values so
    parity is tested on non-trivial weights."""
    leaves, treedef = jax.tree.flatten(params)
    rng = np.random.default_rng(seed)
    new = [jnp.asarray(rng.normal(0, 0.05, l.shape).astype(np.float32))
           for l in leaves]
    return jax.tree.unflatten(treedef, new)


@pytest.mark.parametrize("stem", [1, 2])
def test_backbone_parity(stem):
    """Backbone operates in packed domain: inputs have 3*stem^2 channels."""
    m = Backbone(base_features=8, num_res_blocks=1, stem_factor=stem)
    cpk = 3 * stem * stem
    h, w = 32 // stem, 48 // stem
    a, b = _rand(2, h, w, cpk), _rand(2, h, w, cpk, seed=1)
    ctx = _rand(2, h // 4, w // 4, 16, seed=2)
    params = _randomize(m.init(jax.random.key(0), jnp.asarray(a),
                               jnp.asarray(b), jnp.asarray(ctx)))
    sharp_j, feats_j = m.apply(params, jnp.asarray(a), jnp.asarray(b),
                               jnp.asarray(ctx))
    assert sharp_j.shape == (2, h, w, cpk)
    p_np = jax.device_get(params["params"])
    sharp_t, feats_t = twin.backbone_forward(p_np, a, b, ctx, num_scales=3,
                                             num_res_blocks=1)
    np.testing.assert_allclose(np.asarray(feats_j), feats_t, atol=2e-5)
    np.testing.assert_allclose(np.asarray(sharp_j), sharp_t, atol=2e-5)


def test_convlstm_parity():
    cell = ConvLSTMCell(features=16)
    x = _rand(1, 8, 8, 32)
    h0, c0 = _rand(1, 8, 8, 16, seed=1), _rand(1, 8, 8, 16, seed=2)
    params = _randomize(cell.init(jax.random.key(0), jnp.asarray(x),
                                  (jnp.asarray(h0), jnp.asarray(c0))))
    h_j, c_j = cell.apply(params, jnp.asarray(x),
                          (jnp.asarray(h0), jnp.asarray(c0)))
    h_t, c_t = twin.convlstm_forward(jax.device_get(params["params"]), x, h0, c0)
    np.testing.assert_allclose(np.asarray(h_j), h_t, atol=1e-5)
    np.testing.assert_allclose(np.asarray(c_j), c_t, atol=1e-5)


@pytest.mark.parametrize("name,stem", [("pyramid", 1), ("prf", 1), ("prf", 2)])
def test_pyramid_parity_two_window_steps(name, stem):
    model = build_model(dataclasses.replace(CFG, name=name, stem_factor=stem))
    params = _randomize(model.init(jax.random.key(0), batch=1,
                                   height=32, width=32))
    p_np = jax.device_get(params)
    use_lstm = name == "prf"
    s = 32 // (4 * stem)  # bottleneck resolution

    w1 = _rand(1, 4, 32, 32, 3, seed=3)
    w2 = _rand(1, 4, 32, 32, 3, seed=4)
    states_j = model.initial_state(1, 32, 32)
    states_t = ([(np.zeros((1, s, s, 16), np.float32),
                  np.zeros((1, s, s, 16), np.float32)) for _ in range(3)]
                if use_lstm else None)

    for w in (w1, w2):  # two steps: checks state carry parity too
        outs_j, states_j = model.apply_window(params, jnp.asarray(w), states_j)
        outs_t, states_t2 = twin.pyramid_forward(
            p_np, w, num_levels_total=3, use_convlstm=use_lstm,
            states=states_t, num_scales=3, num_res_blocks=1, stem_factor=stem)
        for oj, ot in zip(outs_j, outs_t):  # both PACKED domain
            np.testing.assert_allclose(np.asarray(oj), ot, atol=5e-5)
        if use_lstm:
            for (hj, cj), (ht, ct) in zip(states_j, states_t2):
                np.testing.assert_allclose(np.asarray(hj), ht, atol=5e-5)
            states_t = states_t2
