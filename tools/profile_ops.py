#!/usr/bin/env python
"""Component microbenchmarks on the current device (slope-timing method —
see bench.py for why host timing needs the chained-scan slope on this
environment's PJRT tunnel)."""

import os as _os
import sys as _sys

# tools/ scripts must run without the editable install (a VM reset wipes
# site-packages): put the repo root ahead of sys.path[0]=tools/.
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np


def slope_time(fn, *args, iters=8):
    """Median per-call device time of fn(*args) via chained-scan slope."""
    @functools.partial(jax.jit, static_argnums=0)
    def chained(n, *a):
        def body(carry, _):
            out = fn(*jax.tree.map(
                lambda x: (x + carry * jnp.float32(1e-30)).astype(x.dtype)
                if jnp.issubdtype(x.dtype, jnp.floating) else x, a))
            leaves = [l for l in jax.tree.leaves(out)
                      if jnp.issubdtype(l.dtype, jnp.floating)]
            return jnp.sum(leaves[0]).astype(jnp.float32), None
        out, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=n)
        return out

    def timed(n):
        t0 = time.monotonic()
        np.asarray(chained(n, *args))
        return time.monotonic() - t0

    timed(1)      # compile n=1
    timed(iters)  # compile n=iters
    t1 = min(timed(1) for _ in range(3))
    tn = min(timed(iters) for _ in range(2))
    return max(tn - t1, 1e-9) / (iters - 1)


def main():
    print("device:", jax.devices()[0])
    rng = np.random.default_rng(0)
    H, W = 720, 1280
    results = {}

    def bench(name, fn, *args, flops=None):
        dt = slope_time(fn, *args)
        line = f"{name:40s} {dt * 1e3:8.2f} ms"
        if flops:
            line += f"  {flops / dt / 1e12:7.1f} TFLOP/s"
        print(line, flush=True)
        results[name] = dt

    def arr(*s, dtype=jnp.bfloat16):
        return jnp.asarray(rng.normal(0, 1, s).astype(np.float32)).astype(dtype)

    import flax.linen as nn

    # 3x3 conv at each pyramid scale (bf16)
    for (h, w, c) in ((H, W, 64), (H // 2, W // 2, 128), (H // 4, W // 4, 256)):
        x = arr(1, h, w, c)
        k = arr(3, 3, c, c)
        dn = jax.lax.conv_dimension_numbers(x.shape, k.shape,
                                            ("NHWC", "HWIO", "NHWC"))
        f = lambda x, k, dn=dn: jax.lax.conv_general_dilated(
            x, k, (1, 1), "SAME", dimension_numbers=dn,
            preferred_element_type=jnp.float32)
        bench(f"conv3x3 {h}x{w}x{c}", f, x, k,
              flops=2 * 9 * c * c * h * w)

    # bilinear resize up/down at decoder scales
    from bin_tpu.ops.resize import upsample2x, downsample2x
    for (h, w, c) in ((H // 2, W // 2, 64), (H // 4, W // 4, 128)):
        x = arr(1, h, w, c)
        bench(f"upsample2x {h}x{w}x{c} (jax.image)", upsample2x, x)
    x = arr(1, H, W, 64)
    bench(f"downsample2x {H}x{W}x64", downsample2x, x)

    # full backbone call at 720p (pair-batch 3, bf16) — the level-1 hot call
    from bin_tpu.config import ModelConfig
    from bin_tpu.models.backbone import Backbone
    mcfg = ModelConfig()
    bb = Backbone(base_features=64, num_res_blocks=4, dtype=jnp.bfloat16)
    a = arr(3, H, W, 3, dtype=jnp.float32)
    b = arr(3, H, W, 3, dtype=jnp.float32)
    params = bb.init(jax.random.key(0), a[:1], b[:1])
    bench("backbone pair-batch 3 @720p", lambda p, x, y: bb.apply(p, x, y)[0],
          params, a, b)


if __name__ == "__main__":
    main()
