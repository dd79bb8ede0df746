"""VGG-16 perceptual loss: torch-layout weight import + feature parity.

torchvision itself is not installed here, so the torch side is a replica of
``torchvision.models.vgg16().features`` built from the same published layer
list (Conv indices 0,2,5,7,10,12,14,...; ReLU; MaxPool at 4,9,16,...). Same
weights -> same features pins both the state_dict key mapping and the
conv/pool/normalization conventions (SURVEY.md §3.2 Loss module [P])."""

import numpy as np
import pytest
import torch
from torch import nn

import jax
import jax.numpy as jnp

from bin_tpu.perceptual import (LAYER_TAPS, VGG16_CHANNELS,
                                init_vgg16_params, make_perceptual_fn,
                                torch_state_to_params, vgg16_features)

torch.manual_seed(0)
torch.set_grad_enabled(False)


def torch_vgg16_features(num_convs: int) -> nn.Sequential:
    """Replica of torchvision vgg16 features up to conv ``num_convs``."""
    layers, cin, convs = [], 3, 0
    for c in VGG16_CHANNELS:
        if convs == num_convs:
            break
        if c == "M":
            layers.append(nn.MaxPool2d(2, 2))
            continue
        layers.append(nn.Conv2d(cin, c, 3, padding=1))
        layers.append(nn.ReLU(inplace=False))
        cin = c
        convs += 1
    return nn.Sequential(*layers)


@pytest.mark.parametrize("layer", ["relu1_2", "relu2_2", "relu3_3"])
def test_feature_parity_with_torch(layer):
    deepest = LAYER_TAPS[layer]
    seq = torch_vgg16_features(deepest + 1)
    # keys look like torchvision's "features.N.weight"
    state = {f"features.{k}": v for k, v in seq.state_dict().items()}
    params = torch_state_to_params(state, num_convs=deepest + 1)

    rng = np.random.default_rng(1)
    x = rng.uniform(0, 1, (2, 32, 32, 3)).astype(np.float32)

    mean = torch.tensor([0.485, 0.456, 0.406]).view(1, 3, 1, 1)
    std = torch.tensor([0.229, 0.224, 0.225]).view(1, 3, 1, 1)
    xt = (torch.from_numpy(x).permute(0, 3, 1, 2) - mean) / std
    want = seq(xt).permute(0, 2, 3, 1).numpy()

    got = np.asarray(vgg16_features(params, jnp.asarray(x), (deepest,))[0])
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-4)


def test_torch_state_shape_validation():
    seq = torch_vgg16_features(2)
    state = dict(seq.state_dict())
    state["0.weight"] = state["0.weight"][:, :2]  # corrupt cin
    with pytest.raises(ValueError, match="expected"):
        torch_state_to_params(state, num_convs=2)


def test_perceptual_fn_properties():
    params = init_vgg16_params(seed=0, num_convs=LAYER_TAPS["relu2_2"] + 1)
    fn = make_perceptual_fn(params, ("relu1_2", "relu2_2"))
    rng = np.random.default_rng(2)
    a = jnp.asarray(rng.uniform(0, 1, (1, 3, 16, 16, 3)).astype(np.float32))
    b = jnp.asarray(rng.uniform(0, 1, (1, 3, 16, 16, 3)).astype(np.float32))
    assert float(fn(a, a)) == 0.0
    d = float(fn(a, b))
    assert np.isfinite(d) and d > 0
    # differentiable
    g = jax.grad(lambda p: fn(p, b))(a)
    assert np.isfinite(np.asarray(g)).all()


def test_vgg_loss_in_train_step():
    """perceptual_mode=vgg trains end-to-end (tiny shapes, CPU)."""
    import dataclasses

    from bin_tpu.config import get_config
    from bin_tpu.registry import build_model
    from bin_tpu.training.state import create_train_state
    from bin_tpu.training.trainer import make_train_step

    cfg = get_config("config1_backbone_128", [
        "model.base_features=8", "model.num_res_blocks=1",
        "data.batch_size=1", "data.crop_size=(32,32)",
        "loss.perceptual_weight=0.05", "loss.perceptual_mode=vgg",
    ])
    cfg = dataclasses.replace(cfg, loss=dataclasses.replace(
        cfg.loss, vgg_layers=("relu1_2", "relu2_2")))
    model = build_model(cfg)
    state = create_train_state(cfg, model, jax.random.key(0))
    step = make_train_step(model, cfg)
    rng = np.random.default_rng(0)
    k = cfg.data.seq_len
    batch = {
        "blurry": rng.uniform(0, 1, (1, k, 32, 32, 3)).astype(np.float32),
        "sharp": rng.uniform(0, 1, (1, 2 * k - 1, 32, 32, 3)).astype(np.float32),
    }
    new_state, aux = step(state, batch)
    assert np.isfinite(float(aux["loss_total"]))
    assert int(new_state.step) == 1
