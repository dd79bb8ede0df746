"""VGG-16 feature extractor + perceptual loss (reference: VGG perceptual
term in the extended config — SURVEY.md §3.2 'Loss module' [P]).

Layout matches ``torchvision.models.vgg16().features`` EXACTLY (conv indices
0,2,5,7,10,12,14,17,19,21,24,26,28; ReLU after each conv; 2x2 max-pool at
4,9,16,23,30), so a downloaded torchvision checkpoint imports directly:

    params = load_vgg16_params("vgg16-397923af.pth")   # torch.load route
    fn = make_perceptual_fn(params)

No pretrained weights exist on this machine (zero egress — SURVEY.md §8
hard part (c)).  Offline fallback: ``init_vgg16_params(seed)`` — fixed-seed
He-initialized filters.  Random-filter VGG perceptual losses are a known
usable surrogate (the multi-scale feature *architecture* does most of the
work); the import path above upgrades it to the real thing without code
changes.  Shape compatibility with torch's VGG is pinned by
tests/test_perceptual.py against a torch replica of the same architecture.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

__all__ = ["VGG16_CHANNELS", "LAYER_TAPS", "init_vgg16_params",
           "torch_state_to_params", "load_vgg16_params", "vgg16_features",
           "make_perceptual_fn"]

# Conv output channels, in torchvision features order; "M" = 2x2 max-pool.
VGG16_CHANNELS = (64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
                  512, 512, 512, "M", 512, 512, 512, "M")

# Tap name -> index into the conv list (feature taken AFTER that conv's ReLU)
LAYER_TAPS = {"relu1_2": 1, "relu2_2": 3, "relu3_3": 6, "relu4_3": 9,
              "relu5_3": 12}

_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
_STD = np.array([0.229, 0.224, 0.225], np.float32)


def _conv_channels():
    out = []
    cin = 3
    for c in VGG16_CHANNELS:
        if c == "M":
            continue
        out.append((cin, c))
        cin = c
    return out


def init_vgg16_params(seed: int = 0, num_convs: int | None = None) -> list:
    """Fixed-seed He-initialized VGG-16 conv stack (offline fallback)."""
    rng = np.random.default_rng(np.random.SeedSequence(seed))
    params = []
    for cin, cout in _conv_channels()[:num_convs]:
        fan_in = 3 * 3 * cin
        k = rng.normal(0, np.sqrt(2.0 / fan_in),
                       size=(3, 3, cin, cout)).astype(np.float32)
        params.append((jnp.asarray(k), jnp.zeros((cout,), jnp.float32)))
    return params


def torch_state_to_params(state_dict: dict, num_convs: int | None = None
                          ) -> list:
    """torchvision VGG state_dict -> [(kernel HWIO, bias)] in features order.

    Accepts keys ``features.N.weight`` (full model) or ``N.weight`` (bare
    nn.Sequential).  torch conv weight (cout, cin, kh, kw) -> (kh, kw, cin,
    cout).
    """
    def get(idx, leaf):
        for key in (f"features.{idx}.{leaf}", f"{idx}.{leaf}"):
            if key in state_dict:
                return np.asarray(state_dict[key], dtype=np.float32)
        raise KeyError(f"VGG state_dict missing conv {idx} ({leaf})")

    params = []
    torch_idx = 0
    expected = _conv_channels()[:num_convs]
    for c in VGG16_CHANNELS:
        if c == "M":
            torch_idx += 1  # the MaxPool2d layer
            continue
        if len(params) == len(expected):
            break
        w = get(torch_idx, "weight").transpose(2, 3, 1, 0)
        b = get(torch_idx, "bias")
        cin, cout = expected[len(params)]
        if w.shape != (3, 3, cin, cout):
            raise ValueError(f"conv {torch_idx}: got {w.shape}, "
                             f"expected {(3, 3, cin, cout)}")
        params.append((jnp.asarray(w), jnp.asarray(b)))
        torch_idx += 2  # Conv2d + ReLU
    return params


def load_vgg16_params(path: str, num_convs: int | None = None) -> list:
    """Load VGG-16 weights from a torchvision ``.pth`` or an ``.npz``."""
    if path.endswith(".npz"):
        data = np.load(path)
        state = {k: data[k] for k in data.files}
    else:
        import torch
        state = torch.load(path, map_location="cpu", weights_only=True)
        state = {k: v.numpy() for k, v in state.items()}
    return torch_state_to_params(state, num_convs)


def vgg16_features(params: list, x: jax.Array,
                   taps: tuple[int, ...]) -> list[jax.Array]:
    """x: (..., H, W, 3) RGB in [0, 1] -> features after the tapped convs.

    Stops at the deepest requested tap.  Leading dims are flattened into
    batch.  Computed in fp32 (perceptual terms are loss-side).
    """
    lead = x.shape[:-3]
    x = x.reshape((-1,) + x.shape[-3:]).astype(jnp.float32)
    x = (x - _MEAN) / _STD
    feats = []
    conv_i = 0
    deepest = max(taps)
    for c in VGG16_CHANNELS:
        if c == "M":
            x = jax.lax.reduce_window(
                x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID")
            continue
        k, b = params[conv_i]
        x = jax.lax.conv_general_dilated(
            x, k, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + b
        x = jax.nn.relu(x)
        if conv_i in taps:
            feats.append(x.reshape(lead + x.shape[1:]))
            if conv_i == deepest:
                break
        conv_i += 1
    return feats


def make_perceptual_fn(params: list,
                       layers: tuple[str, ...] = ("relu1_2", "relu2_2",
                                                  "relu3_3"),
                       layer_weights: tuple[float, ...] | None = None):
    """(pred, target) -> scalar mean-L1 distance over VGG feature maps.

    pred/target: (..., H, W, 3) RGB in [0, 1]; spatial dims must be even
    multiples of the pooling factor reached by the deepest layer.
    """
    taps = tuple(LAYER_TAPS[name] for name in layers)
    weights = layer_weights or (1.0,) * len(taps)

    def loss(pred: jax.Array, target: jax.Array) -> jax.Array:
        fp = vgg16_features(params, pred, taps)
        ft = vgg16_features(params, target, taps)
        total = jnp.float32(0.0)
        for w, a, b in zip(weights, fp, ft):
            total = total + w * jnp.mean(jnp.abs(a - b))
        return total / len(taps)

    return loss
