#!/usr/bin/env python
"""Per-op device profile of the flagship window step (or clip scan).

Captures a jax.profiler trace (works on the axon tunnel — device ops appear
on the 'XLA Ops' thread), then aggregates durations by fused-op name.
Usage: python tools/trace_window.py [--clip] [--stem N] [--base N]
"""

import os as _os
import sys as _sys

# tools/ scripts must run without the editable install (a VM reset wipes
# site-packages): put the repo root ahead of sys.path[0]=tools/.
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import glob
import gzip
import json
import os
import tempfile
from collections import defaultdict

import jax
import jax.numpy as jnp
import numpy as np


def capture(fn, *args, trace_dir=None):
    trace_dir = trace_dir or tempfile.mkdtemp(prefix="jaxtrace_")
    out = fn(*args)  # compile outside the trace
    _ = np.asarray(out)
    with jax.profiler.trace(trace_dir):
        for _ in range(3):
            _ = np.asarray(fn(*args))
    files = glob.glob(os.path.join(trace_dir, "**/*.trace.json.gz"),
                      recursive=True)
    assert files, f"no trace written under {trace_dir}"
    return max(files, key=os.path.getmtime)


def report(trace_file, top=25, reps=3):
    d = json.load(gzip.open(trace_file))
    meta = {(e.get("pid"), e.get("tid")): e["args"]["name"]
            for e in d["traceEvents"] if e.get("ph") == "M"
            and e.get("name") == "thread_name"}
    ops = defaultdict(lambda: [0.0, 0])
    total = 0.0
    for e in d["traceEvents"]:
        if e.get("ph") != "X":
            continue
        if meta.get((e.get("pid"), e.get("tid"))) != "XLA Ops":
            continue
        name = e["name"]
        ops[name][0] += e.get("dur", 0.0)
        ops[name][1] += 1
        total += e.get("dur", 0.0)
    print(f"total device op time: {total / reps / 1e3:.2f} ms per run")
    print(f"{'op':58s} {'ms/run':>9s} {'count':>6s} {'%':>6s}")
    for name, (dur, count) in sorted(ops.items(), key=lambda kv: -kv[1][0])[:top]:
        print(f"{name[:58]:58s} {dur / reps / 1e3:9.2f} {count // reps:6d} "
              f"{100 * dur / total:5.1f}%")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--clip", action="store_true", help="trace infer_clip scan")
    p.add_argument("--stem", type=int, default=2)
    p.add_argument("--base", type=int, default=128)
    p.add_argument("--height", type=int, default=720)
    p.add_argument("--width", type=int, default=1280)
    p.add_argument("--batch", type=int, default=1)
    args = p.parse_args()

    from bin_tpu.config import ModelConfig
    from bin_tpu.registry import build_model

    cfg = ModelConfig(name="prf", base_features=args.base,
                      stem_factor=args.stem, dtype="bfloat16")
    model = build_model(cfg)
    params = model.init(jax.random.key(0), batch=1, height=64, width=64)
    rng = np.random.default_rng(0)

    if args.clip:
        clip = jnp.asarray(rng.uniform(
            0, 1, (args.batch, 8, args.height, args.width, 3)).astype(np.float32))
        fn = jax.jit(lambda p, c: model.infer_clip(p, c)[0])
        trace = capture(lambda: jnp.sum(fn(params, clip)))
    else:
        window = jnp.asarray(rng.uniform(
            0, 1, (args.batch, 4, args.height, args.width, 3)).astype(np.float32))
        states = model.initial_state(args.batch, args.height, args.width)

        @jax.jit
        def step(p, w, s):
            outs, ns = model.apply_window(p, w, s)
            # consume EVERYTHING so no level is dead-code-eliminated
            return (sum(jnp.sum(o) for o in outs)
                    + sum(jnp.sum(h) + jnp.sum(c) for h, c in ns))

        trace = capture(lambda: step(params, window, states))
    print("trace:", trace)
    report(trace)


if __name__ == "__main__":
    main()
