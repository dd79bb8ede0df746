#!/usr/bin/env python
"""Bisect flagship window-step time on TPU: backbone vs pyramid levels vs
ConvLSTM vs scan overhead (slope-timing; see profile_ops.py)."""

import dataclasses
import sys, os

sys.path.insert(0, os.path.dirname(__file__))

import jax
import jax.numpy as jnp
import numpy as np

from profile_ops import slope_time
from bin_tpu.config import ModelConfig
from bin_tpu.models.backbone import Backbone
from bin_tpu.registry import build_model


def main():
    print("device:", jax.devices()[0], flush=True)
    rng = np.random.default_rng(0)
    H, W = 720, 1280
    base = dict(base_features=128, channel_mult=(1, 2, 4), num_res_blocks=4,
                convlstm_features=256, stem_factor=2, dtype="bfloat16")

    def arr(*s):
        return jnp.asarray(rng.uniform(0, 1, s).astype(np.float32))

    def bench(name, fn, *args):
        dt = slope_time(fn, *args, iters=6)
        print(f"{name:44s} {dt * 1e3:9.2f} ms", flush=True)
        return dt

    # single backbone, pair-batch 3 (the level-1 call)
    bb = Backbone(base_features=128, num_res_blocks=4, stem_factor=2,
                  dtype=jnp.bfloat16)
    a, b = arr(3, H, W, 3), arr(3, H, W, 3)
    pb = bb.init(jax.random.key(0), a[:1], b[:1])
    bench("backbone stem2 b128 pair-batch3",
          lambda p, x, y: bb.apply(p, x, y)[0], pb, a, b)

    window = arr(1, 4, H, W, 3)
    for name, kw in (
        ("window L1 only (backbone)", dict(name="backbone")),
        ("window L1-2 (pyramid lite)", dict(name="pyramid", num_levels=2,
                                            cycle_level=False)),
        ("window L1-3 (pyramid+cycle)", dict(name="pyramid", num_levels=2,
                                             cycle_level=True)),
        ("window L1-3 + ConvLSTM (prf)", dict(name="prf", num_levels=2,
                                              cycle_level=True)),
    ):
        cfg = ModelConfig(**{**base, **kw})
        model = build_model(cfg)
        params = model.init(jax.random.key(0), batch=1, height=64, width=64)
        states = model.initial_state(1, H, W)
        bench(name, lambda p, w, s=states, m=model: m.apply_window(p, w, s)[0][0],
              params, window)

    # full clip scan (5 windows) for the flagship
    cfg = ModelConfig(**{**base, "name": "prf"})
    model = build_model(cfg)
    params = model.init(jax.random.key(0), batch=1, height=64, width=64)
    clip = arr(1, 8, H, W, 3)
    dt = bench("clip scan 8 keys (5 windows) infer_clip",
               lambda p, c, m=model: m.infer_clip(p, c)[0], params, clip)
    print(f"  -> per window: {dt / 5 * 1e3:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
