#!/usr/bin/env python
"""Why are full-res (720p, C=64) convs at 6% MFU? Test layout remedies."""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

from profile_ops import slope_time  # reuse slope timing


def main():
    print("device:", jax.devices()[0])
    rng = np.random.default_rng(0)

    def arr(*s, dtype=jnp.bfloat16):
        return jnp.asarray(rng.normal(0, 1, s).astype(np.float32)).astype(dtype)

    def conv(x, k, stride=1, pet=jnp.float32):
        dn = jax.lax.conv_dimension_numbers(x.shape, k.shape,
                                            ("NHWC", "HWIO", "NHWC"))
        return jax.lax.conv_general_dilated(
            x, k, (stride, stride), "SAME", dimension_numbers=dn,
            preferred_element_type=pet)

    def bench(name, fn, *args, flops):
        dt = slope_time(fn, *args)
        print(f"{name:46s} {dt * 1e3:8.2f} ms  {flops / dt / 1e12:7.1f} TFLOP/s",
              flush=True)

    H, W = 720, 1280
    # baseline again
    bench("conv3x3 b1 720p c64", conv, arr(1, H, W, 64), arr(3, 3, 64, 64),
          flops=2 * 9 * 64 * 64 * H * W)
    # batch amortization
    bench("conv3x3 b4 720p c64", conv, arr(4, H, W, 64), arr(3, 3, 64, 64),
          flops=4 * 2 * 9 * 64 * 64 * H * W)
    # wider channels at full res
    bench("conv3x3 b1 720p c128", conv, arr(1, H, W, 128), arr(3, 3, 128, 128),
          flops=2 * 9 * 128 * 128 * H * W)
    # bf16 accumulate
    bench("conv3x3 b1 720p c64 pet=bf16",
          lambda x, k: conv(x, k, pet=jnp.bfloat16),
          arr(1, H, W, 64), arr(3, 3, 64, 64), flops=2 * 9 * 64 * 64 * H * W)
    # 1x1 conv = pure GEMM at 720p spatial
    bench("conv1x1 b1 720p c64", conv, arr(1, H, W, 64), arr(1, 1, 64, 64),
          flops=2 * 64 * 64 * H * W)
    # space-to-depth equivalent: 360x640x256, 2x2 kernel (exactly emulates a
    # 3x3 conv on the full-res image, 16/9 more FLOPs)
    bench("conv2x2 b1 360p c256 (s2d-equiv)", conv,
          arr(1, H // 2, W // 2, 256), arr(2, 2, 256, 256),
          flops=2 * 4 * 256 * 256 * (H // 2) * (W // 2))
    # s2d with 3x3 at 360p c256 (richer, what a redesigned stage would use)
    bench("conv3x3 b1 360p c256", conv,
          arr(1, H // 2, W // 2, 256), arr(3, 3, 256, 256),
          flops=2 * 9 * 256 * 256 * (H // 2) * (W // 2))
    # depthwise-ish grouped conv at full res (feature_group_count=64)
    x = arr(1, H, W, 64)
    k = arr(3, 3, 1, 64)
    dn = jax.lax.conv_dimension_numbers(x.shape, k.shape, ("NHWC", "HWIO", "NHWC"))
    bench("depthwise3x3 b1 720p c64",
          lambda x, k: jax.lax.conv_general_dilated(
              x, k, (1, 1), "SAME", dimension_numbers=dn,
              feature_group_count=64, preferred_element_type=jnp.float32),
          x, k, flops=2 * 9 * 64 * H * W)


if __name__ == "__main__":
    import sys, os
    sys.path.insert(0, os.path.dirname(__file__))
    main()
