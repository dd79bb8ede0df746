"""PyTorch (CPU) twin of the bin_tpu model for golden-value parity tests.

The reference repo is unavailable (SURVEY.md §0), so parity is established
against a torch twin implementing the SAME documented architecture: same
weights → same outputs to fp32 tolerance (SURVEY.md §5, §8 stage 3).  This
pins our conv/pad/resize conventions:

  * 3x3 stride-1 convs: flax 'SAME' == torch padding=1
  * 3x3 stride-2 convs: flax 'SAME' pads (0,1)x(0,1) for even inputs —
    twin replicates with explicit F.pad then VALID conv
  * bilinear resize: jax.image.resize == F.interpolate(align_corners=False)
  * LeakyReLU slope 0.1; LSTM gate order (i, f, g, o) with forget bias 1.0

Weight transfer: flax conv kernel (kh, kw, cin, cout) → torch (cout, cin,
kh, kw) permutation; biases map directly.
"""

from __future__ import annotations

import numpy as np
import torch
import torch.nn.functional as F

torch.set_grad_enabled(False)


def _t(x) -> torch.Tensor:
    """NHWC numpy/jax array → NCHW torch tensor."""
    return torch.from_numpy(np.array(x)).permute(0, 3, 1, 2).contiguous()


def _n(x: torch.Tensor) -> np.ndarray:
    """NCHW torch tensor → NHWC numpy."""
    return x.permute(0, 2, 3, 1).contiguous().numpy()


def _w(params: dict) -> tuple[torch.Tensor, torch.Tensor]:
    """Flax Conv param dict → (torch weight, bias)."""
    kernel = torch.from_numpy(np.array(params["kernel"]))
    weight = kernel.permute(3, 2, 0, 1).contiguous()
    bias = torch.from_numpy(np.array(params["bias"]))
    return weight, bias


def conv_same(x: torch.Tensor, p: dict, stride: int = 1) -> torch.Tensor:
    w, b = _w(p)
    kh = w.shape[2]
    if stride == 1:
        return F.conv2d(x, w, b, padding=kh // 2)
    # flax SAME for stride 2, even input, k=3: pad (top 0? ) — SAME pads
    # total = k - stride = 1, split (0, 1) → pad right/bottom only... flax
    # splits pad_total as (pad_total//2, pad_total - pad_total//2) = (0, 1)
    x = F.pad(x, (0, 1, 0, 1))
    return F.conv2d(x, w, b, stride=stride)


def lrelu(x, slope=0.1):
    return F.leaky_relu(x, slope)


def upsample2x(x: torch.Tensor) -> torch.Tensor:
    return F.interpolate(x, scale_factor=2, mode="bilinear", align_corners=False)


def upsample_conv(x: torch.Tensor, p: dict) -> torch.Tensor:
    """Twin of the decoder Upsample: bilinear 2x then REPLICATE-padded 3x3
    conv (bin_tpu fuses this into a phase-bank conv; the replicate border is
    part of the op's definition — see ops/fused_upsample.py)."""
    w, b = _w(p)
    up = F.pad(upsample2x(x), (1, 1, 1, 1), mode="replicate")
    return F.conv2d(up, w, b)


def space_to_depth_np(x: np.ndarray, f: int) -> np.ndarray:
    """NHWC numpy mirror of bin_tpu.ops.pixel_shuffle.space_to_depth
    (pixel-major (fy, fx, C) channel layout — NOT torch pixel_unshuffle's
    channel-major layout)."""
    if f == 1:
        return x
    n, h, w, c = x.shape
    x = x.reshape(n, h // f, f, w // f, f, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(n, h // f, w // f, f * f * c)


def depth_to_space_np(x: np.ndarray, f: int) -> np.ndarray:
    if f == 1:
        return x
    n, h, w, cff = x.shape
    c = cff // (f * f)
    x = x.reshape(n, h, w, f, f, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(n, h * f, w * f, c)


def res_block(x, p, slope=0.1):
    h = lrelu(conv_same(x, p["Conv_0"]), slope)
    return x + conv_same(h, p["Conv_1"])


def backbone_forward(params: dict, frame_a, frame_b, context=None,
                     num_scales: int = 3, num_res_blocks: int = 1,
                     slope: float = 0.1):
    """Twin of bin_tpu.models.backbone.Backbone.__call__ (NHWC numpy I/O).

    PACKED domain like the flax module: frames arrive space-to-depth'd
    (channels 3*f^2); the caller packs/unpacks (see pyramid_forward)."""
    a, b = _t(frame_a), _t(frame_b)
    x = torch.cat([a, b], dim=1)
    x = lrelu(conv_same(x, params["head"]["Conv_0"]), slope)
    skips = []
    for i in range(num_scales - 1):
        x = res_block(x, params[f"enc_{i}"], slope)
        skips.append(x)
        x = lrelu(conv_same(x, params[f"down_{i}"]["Conv_0"], stride=2), slope)
    if context is not None:
        ctx = _t(context)
        cw, cb = _w(params["context_proj"])
        x = x + F.conv2d(ctx, cw, cb)
    for i in range(num_res_blocks):
        x = res_block(x, params[f"mid_{i}"], slope)
    feats = x
    for i in reversed(range(num_scales - 1)):
        x = lrelu(upsample_conv(x, params[f"up_{i}"]["Conv_0"]), slope)
        x = x + skips[i]
        x = res_block(x, params[f"dec_{i}"], slope)
    residual = conv_same(x, params["tail"])
    sharp = 0.5 * (a + b) + residual
    return _n(sharp), _n(feats)


def convlstm_forward(params: dict, x, h, c, forget_bias: float = 1.0):
    """Twin of bin_tpu.models.convlstm.ConvLSTMCell (NHWC numpy I/O)."""
    inp = torch.cat([_t(x), _t(h)], dim=1)
    gates = conv_same(inp, params["gates"])
    i, f, g, o = torch.chunk(gates, 4, dim=1)
    new_c = torch.sigmoid(f + forget_bias) * _t(c) + torch.sigmoid(i) * torch.tanh(g)
    new_h = torch.sigmoid(o) * torch.tanh(new_c)
    return _n(new_h), _n(new_c)


def pyramid_forward(params: dict, window, num_levels_total: int,
                    use_convlstm: bool, states=None,
                    num_scales: int = 3, num_res_blocks: int = 1,
                    stem_factor: int = 1, clamp_intermediate: bool = True):
    """Twin of BINPyramid.__call__: window (B,K,H,W,3) NHWC numpy; packs
    once at the window level, returns PACKED outputs like the flax model.
    Mirrors the consume-side inter-level clamp to [-0.5, 1.5] that
    BINPyramid applies when cfg.clamp_intermediate (the default)."""
    window = np.asarray(window)
    b, k = window.shape[:2]
    frames = [space_to_depth_np(window[:, i], stem_factor) for i in range(k)]
    outputs, new_states = [], []
    for li in range(num_levels_total):
        bb = params[f"level_{li + 1}"]
        if clamp_intermediate and li > 0:
            frames = [np.clip(f, -0.5, 1.5) for f in frames]
        outs, feats = [], []
        for a, fb in zip(frames[:-1], frames[1:]):
            ctx = states[li][0] if use_convlstm else None
            sharp, feat = backbone_forward(bb, a, fb, ctx, num_scales,
                                           num_res_blocks)
            outs.append(sharp)
            feats.append(feat)
        outputs.append(np.stack(outs, axis=1))
        if use_convlstm:
            mean_feat = np.mean(np.stack(feats, axis=0), axis=0)
            h, c = convlstm_forward(params[f"lstm_{li + 1}"], mean_feat,
                                    states[li][0], states[li][1])
            new_states.append((h, c))
        frames = outs
    return outputs, new_states
