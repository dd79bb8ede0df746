#!/usr/bin/env python
"""int8 PTQ feasibility microbench (VERDICT r2 item 9 / SURVEY.md §8 stage 6).

The v5e's int8 peak (394 TOPS) is 2x its bf16 peak (197 TF/s), and the
flagship's convs already run at 81-99% of the bf16 roofline — so int8
convolution is the only remaining big single-chip throughput lever.  Before
building a PTQ inference path, measure the PRIMITIVE: does
lax.conv_general_dilated with int8 operands and preferred_element_type=int32
actually lower to the int8 MXU path through XLA on this chip, and at what
rate vs the same-shape bf16 conv?

Method: slope timing over a chained lax.scan (block_until_ready is a no-op
on the axon tunnel — same methodology as bench.py), at the flagship's
dominant conv shapes (BASELINE.md per-op attribution).

Outcome contract: if int8 is not ~2x bf16 here, PTQ is recorded as
rejected-by-measurement (like the Pallas LSTM kernel) and the quality-delta
study is moot.
"""

from __future__ import annotations

import argparse
import functools
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def slope_time(fn, *args, iters=8):
    """Median wall time per op via chained-scan slope (tunnel-safe)."""

    @functools.partial(jax.jit, static_argnums=0)
    def chained(n, *a):
        def body(carry, _):
            out = fn(*jax.tree.map(lambda x: x, a))
            # tiny data dependence so XLA can't hoist the op out of the scan
            return carry + jnp.float32(out.ravel()[0].astype(jnp.float32)), None

        c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=n)
        return c

    float(chained(1, *args))  # compile
    def t(n):
        t0 = time.monotonic()
        float(chained(n, *args))
        return time.monotonic() - t0
    t1 = min(t(1) for _ in range(3))
    tn = min(t(iters) for _ in range(3))
    return max(tn - t1, 1e-9) / (iters - 1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--height", type=int, default=180)
    ap.add_argument("--width", type=int, default=320)
    ap.add_argument("--cin", type=int, default=256)
    ap.add_argument("--cout", type=int, default=256)
    ap.add_argument("--batch", type=int, default=5)
    ap.add_argument("--iters", type=int, default=8)
    args = ap.parse_args()

    dev = jax.devices()[0]
    log(f"device: {dev.platform} {getattr(dev, 'device_kind', '?')}")
    b, h, w, ci, co = args.batch, args.height, args.width, args.cin, args.cout
    rng = np.random.default_rng(0)
    x_f = jnp.asarray(rng.uniform(-1, 1, (b, h, w, ci)).astype(np.float32))
    k_f = jnp.asarray(rng.uniform(-0.1, 0.1, (3, 3, ci, co)).astype(np.float32))
    x8 = jnp.asarray(rng.integers(-127, 128, (b, h, w, ci), dtype=np.int8))
    k8 = jnp.asarray(rng.integers(-127, 128, (3, 3, ci, co), dtype=np.int8))
    dn = ("NHWC", "HWIO", "NHWC")
    flops = 2 * b * h * w * ci * co * 9

    def conv_bf16(x, k):
        return jax.lax.conv_general_dilated(
            x.astype(jnp.bfloat16), k.astype(jnp.bfloat16), (1, 1), "SAME",
            dimension_numbers=dn, preferred_element_type=jnp.float32)

    def conv_int8(x, k):
        return jax.lax.conv_general_dilated(
            x, k, (1, 1), "SAME", dimension_numbers=dn,
            preferred_element_type=jnp.int32)

    def conv_int8_dequant(x, k):
        # the realistic PTQ epilogue: int32 accum -> fp32 scale
        out = jax.lax.conv_general_dilated(
            x, k, (1, 1), "SAME", dimension_numbers=dn,
            preferred_element_type=jnp.int32)
        return out.astype(jnp.float32) * jnp.float32(1e-4)

    rows = []
    for name, fn, xx, kk in (
        ("bf16", conv_bf16, x_f, k_f),
        ("int8->int32", conv_int8, x8, k8),
        ("int8+dequant", conv_int8_dequant, x8, k8),
    ):
        try:
            dt = slope_time(fn, xx, kk, iters=args.iters)
            rate = flops / dt / 1e12
            rows.append((name, dt * 1e3, rate))
            log(f"{name:14s} {dt * 1e3:8.3f} ms  {rate:7.1f} T(FL)OP/s")
        except Exception as e:
            log(f"{name:14s} FAILED: {type(e).__name__}: {e}")
            rows.append((name, None, None))

    import json
    print(json.dumps({
        "shape": [b, h, w, ci, co],
        "results": [{"name": n, "ms": m, "tops": r} for n, m, r in rows],
        "verdict": ("int8 wins" if rows[0][1] and rows[1][1]
                    and rows[1][1] < 0.7 * rows[0][1] else "no int8 win"),
    }))


if __name__ == "__main__":
    main()
