#!/usr/bin/env python
"""Join a device trace with the optimized HLO: per-op time, FLOPs, TF/s.

XLA dump files are unavailable through the remote-compile tunnel, but
``jit(fn).lower(...).compile().as_text()`` returns the optimized scheduled
module, whose instruction names match the profiler's 'XLA Ops' thread.
This compiles the flagship window step, computes conv FLOPs per fusion,
captures a trace, and prints per-op efficiency — the per-op view VERDICT
round 1 asked for.

Usage: python tools/attribute_trace.py [--stem 4] [--base 256] [--top 30]
"""

import argparse
import glob
import gzip
import json
import os
import re
import sys
import tempfile
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

V5E_PEAK = 197e12  # bf16 dense peak, TPU v5e (394 TOPS is the int8 figure)
DTYPE_BYTES = {"f32": 4, "bf16": 2, "f16": 2, "s32": 4, "u32": 4,
               "pred": 1, "u8": 1, "s8": 1, "f64": 8, "s64": 8, "u64": 8}

_INSTR = re.compile(
    r"^\s*(?:ROOT\s+)?%?([\w.\-]+)\s*=\s*(\(?[\w\[\],{}:()\s]*?\)?)\s+"
    r"([\w\-]+)\((.*)$")
_SHAPE = re.compile(r"(\w+)\[([\d,]*)\](?:\{([\d,]+)\})?")


def shape_of(type_str):
    m = _SHAPE.search(type_str)
    if not m:
        return None
    return m.group(1), [int(d) for d in m.group(2).split(",") if d]


def typestr_of(type_str):
    """Compact 'bf16[90,24,21,1024]{3,2,1,0}' rendering (keeps layout —
    a non-default minor-to-major is usually WHY a copy exists)."""
    m = _SHAPE.search(type_str)
    if not m:
        return "?"
    lay = "{" + m.group(3) + "}" if m.group(3) else ""
    return f"{m.group(1)}[{m.group(2)}]{lay}"


def nelems(dims):
    n = 1
    for d in dims:
        n *= d
    return n


def parse_module(txt: str):
    """Returns (entry_table, comp_flops, comp_desc).

    entry_table: entry instruction name -> (opcode, result type str,
                 called computation or None)
    comp_flops/desc: fused computation name -> summed conv FLOPs / label.
    """
    comp_types = defaultdict(dict)   # comp -> instr name -> type str
    comp_convs = defaultdict(list)   # comp -> (flops, desc)
    comp_opcodes = defaultdict(lambda: defaultdict(int))  # comp -> opcode -> n
    entry = {}
    entry_operands = {}              # entry instr name -> [operand names]
    entry_types = {}                 # entry instr name -> result type str
    cur, in_entry = None, False
    for raw in txt.splitlines():
        line = raw.rstrip()
        ls = line.strip()
        mc = re.match(r"(ENTRY\s+)?%?([\w.\-]+)\s+\(.*\)\s+->\s+.*{\s*$", ls)
        if mc:
            cur = mc.group(2)
            in_entry = bool(mc.group(1))
            continue
        if ls == "}":
            cur, in_entry = None, False
            continue
        if cur is None:
            continue
        mi = _INSTR.match(ls)
        if not mi:
            continue
        name, rtype, opcode, rest = mi.groups()
        comp_types[cur][name] = rtype
        comp_opcodes[cur][opcode] += 1
        if in_entry:
            mcall = re.search(r"calls=%?([\w.\-]+)", ls)
            entry[name] = (opcode, rtype, mcall.group(1) if mcall else None)
            entry_types[name] = rtype
            entry_operands[name] = [a.strip().lstrip("%") for a in
                                    rest.split(")")[0].split(",") if a.strip()]
        if opcode == "convolution":
            # operands by name (printed without types in this HLO dialect)
            args = [a.strip().lstrip("%") for a in
                    rest.split(")")[0].split(",")]
            out = shape_of(rtype)
            ker = shape_of(comp_types[cur].get(args[1], "")) if len(args) > 1 else None
            if out and ker:
                dl = re.search(r"dim_labels=\S*?->(\w+)", ls)
                # FLOPs = 2 * out_elems * (kernel elems / C_out); C_out is
                # the output feature dim (last unless dim_labels says else)
                co_idx = dl.group(1).index("f") if dl else len(out[1]) - 1
                co = out[1][co_idx]
                flops = 2 * nelems(out[1]) * nelems(ker[1]) // max(co, 1)
                comp_convs[cur].append(
                    (flops, f"conv k{ker[1]}->{out[0]}{out[1]}"))
    comp_flops = {c: sum(f for f, _ in v) for c, v in comp_convs.items()}
    comp_desc = {c: "; ".join(d for _, d in v[:2]) +
                    (f" +{len(v)-2}" if len(v) > 2 else "")
                 for c, v in comp_convs.items()}
    aux = {"operands": entry_operands, "types": entry_types,
           "opcodes": dict(comp_opcodes)}
    return entry, comp_flops, comp_desc, aux


_BORING = {"parameter", "constant", "broadcast", "get-tuple-element",
           "tuple", "bitcast", "convert"}


def nonconv_desc(name, entry, aux):
    """'copy bf16[1,180,320,512]{2,3,1,0} <- {3,2,1,0}' style description:
    result type+layout, operand layouts when they differ, and for fusions
    the opcode histogram of the fused computation — enough to see WHICH
    tensor handoff a copy/reshape serves and whether a layout flip is why."""
    opcode, rtype, called = entry.get(name, ("?", "", None))
    out = typestr_of(rtype)
    ins = [typestr_of(aux["types"].get(o, ""))
           for o in aux["operands"].get(name, [])
           if o in aux["types"]]
    ins = [t for t in ins if t != "?"][:2]
    desc = f"{opcode} {out}"
    if ins:
        desc += " <- " + ", ".join(ins)
    if called and called in aux["opcodes"]:
        hist = {k: v for k, v in aux["opcodes"][called].items()
                if k not in _BORING}
        inner = ",".join(f"{k}x{v}" if v > 1 else k for k, v in
                         sorted(hist.items(), key=lambda kv: -kv[1])[:4])
        if inner:
            desc += f" [{inner}]"
    return desc


def capture_trace(fn, reps=3):
    import numpy as np
    import jax
    trace_dir = tempfile.mkdtemp(prefix="jaxtrace_")
    _ = np.asarray(fn())
    with jax.profiler.trace(trace_dir):
        for _ in range(reps):
            _ = np.asarray(fn())
    files = glob.glob(os.path.join(trace_dir, "**/*.trace.json.gz"),
                      recursive=True)
    assert files, f"no trace under {trace_dir}"
    d = json.load(gzip.open(max(files, key=os.path.getmtime)))
    meta = {(e.get("pid"), e.get("tid")): e["args"]["name"]
            for e in d["traceEvents"] if e.get("ph") == "M"
            and e.get("name") == "thread_name"}
    ops = defaultdict(float)
    for e in d["traceEvents"]:
        if e.get("ph") == "X" and meta.get((e.get("pid"), e.get("tid"))) == "XLA Ops":
            ops[e["name"]] += e.get("dur", 0.0)
    return {k: v / reps for k, v in ops.items()}  # us per run


def report(compiled_text, durs, top=30, json_out=None):
    entry, comp_flops, comp_desc, aux = parse_module(compiled_text)
    total_us = sum(durs.values())
    rows = []
    total_flops = 0
    for name, us in durs.items():
        opcode, rtype, called = entry.get(name, ("?", "", None))
        flops = comp_flops.get(called, 0) if called else 0
        desc = (comp_desc.get(called) if called else None) or \
            nonconv_desc(name, entry, aux)
        sh = shape_of(rtype)
        nbytes = nelems(sh[1]) * DTYPE_BYTES.get(sh[0], 4) if sh else 0
        total_flops += flops
        rows.append((us, name, flops, nbytes, desc))
    print(f"total device time {total_us/1e3:.2f} ms; attributed conv FLOPs "
          f"{total_flops/1e12:.2f} TF -> {total_flops/(total_us*1e-6)/1e12:.1f}"
          f" TF/s ({total_flops/(total_us*1e-6)/V5E_PEAK:.1%} of v5e peak)")
    print(f"{'op':26s} {'ms':>7s} {'%':>5s} {'TF/s':>6s} {'outGB/s':>8s}  desc")
    for us, name, flops, nbytes, desc in sorted(rows, reverse=True)[:top]:
        tfs = flops / (us * 1e-6) / 1e12 if us else 0
        gbs = nbytes / (us * 1e-6) / 1e9 if us else 0
        print(f"{name[:26]:26s} {us/1e3:7.2f} {100*us/total_us:4.1f}% "
              f"{tfs:6.1f} {gbs:8.1f}  {desc[:78]}")
    if json_out:
        with open(json_out, "w") as f:
            json.dump([{"name": n, "us": us, "flops": fl, "bytes": by,
                        "desc": d} for us, n, fl, by, d in
                       sorted(rows, reverse=True)], f, indent=0)
        print(f"full table -> {json_out}")
    # category rollup
    cats = defaultdict(float)
    for us, name, flops, nbytes, desc in rows:
        cats["conv fusions" if flops else
             ("data movement" if any(k in desc for k in
              ("copy", "reshape", "transpose", "slice", "concatenate"))
              else "other")] += us
    print("\ncategory rollup:")
    for c, us in sorted(cats.items(), key=lambda kv: -kv[1]):
        print(f"  {c:16s} {us/1e3:8.2f} ms {100*us/total_us:5.1f}%")

    # The named list VERDICT r2 item 3 asks for: where the non-conv time is
    nonconv = sorted((r for r in rows if not r[2]), reverse=True)
    print("\ntop non-conv ops (the recoverable slice):")
    for us, name, _fl, nbytes, desc in nonconv[:12]:
        gbs = nbytes / (us * 1e-6) / 1e9 if us else 0
        print(f"  {name[:30]:30s} {us/1e3:7.2f} ms {100*us/total_us:4.1f}% "
              f"{gbs:8.1f} GB/s  {desc[:110]}")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--stem", type=int, default=4)
    p.add_argument("--base", type=int, default=256)
    p.add_argument("--height", type=int, default=720)
    p.add_argument("--width", type=int, default=1280)
    p.add_argument("--top", type=int, default=30)
    p.add_argument("--json", default=None, help="write full op table to file")
    p.add_argument("--s2d-via-conv", action="store_true",
                   help="trace with model.s2d_via_conv=true (input pack as "
                        "one-hot strided conv instead of transpose)")
    p.add_argument("--int8", action="store_true",
                   help="trace the int8 serving graph (model.conv_int8=true) "
                        "instead of pure bf16 — the bench default is scoped "
                        "int8, so this is the graph the fps record runs")
    p.add_argument("--int8-min-cin", type=int, default=0,
                   help="model.conv_int8_min_cin for --int8 (bench default "
                        "serving scope is 256)")
    p.add_argument("--clip", type=int, default=0, metavar="KEYS",
                   help="trace model.infer_clip on a KEYS-frame clip (the "
                        "bench graph: pack once, scan windows, assemble + "
                        "unpack) instead of one raw apply_window")
    p.add_argument("--d2s-conv", action="store_true",
                   help="model.d2s_via_conv=true (decoder phase interleave "
                        "as a one-hot transposed conv — the round-4 layout-"
                        "thrash fix candidate)")
    p.add_argument("--int8-lstm", action="store_true",
                   help="model.conv_int8_lstm=true (part of the bench "
                        "default mode since runs/BENCH_OVERRIDES.json)")
    p.add_argument("--set", dest="overrides", action="append", default=[],
                   metavar="model.KEY=VALUE",
                   help="extra model-config override applied after the "
                        "dedicated flags (e.g. model.d2s_final_via_conv="
                        "false). Repeatable.")
    p.add_argument("--dump-hlo", default=None, metavar="PATH",
                   help="also write the optimized scheduled HLO text to "
                        "PATH and exit WITHOUT running on the device — the "
                        "compile goes through the chipless remote-compile "
                        "helper, so producer/consumer context for any op in "
                        "the trace table can be inspected while the chip is "
                        "busy with queued work")
    args = p.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp
    from bin_tpu.config import ModelConfig, apply_model_overrides
    from bin_tpu.registry import build_model
    from bin_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()
    cfg = ModelConfig(name="prf", base_features=args.base,
                      stem_factor=args.stem, dtype="bfloat16",
                      s2d_via_conv=args.s2d_via_conv,
                      d2s_via_conv=args.d2s_conv,
                      conv_int8=args.int8,
                      conv_int8_min_cin=args.int8_min_cin,
                      conv_int8_lstm=args.int8_lstm)
    cfg = apply_model_overrides(cfg, args.overrides)
    model = build_model(cfg)
    params = model.init(jax.random.key(0), batch=1, height=64, width=64)
    rng = np.random.default_rng(0)
    if args.clip:
        clip = jnp.asarray(rng.uniform(
            0, 1, (1, args.clip, args.height, args.width, 3)
        ).astype(np.float32))

        @jax.jit
        def step(p_, c):
            video, _times = model.infer_clip(p_, c)
            return jnp.sum(video)

        compiled = step.lower(params, clip).compile()
    else:
        window = jnp.asarray(rng.uniform(
            0, 1, (1, 4, args.height, args.width, 3)).astype(np.float32))
        states = model.initial_state(1, args.height, args.width)

        @jax.jit
        def step(p_, w, s):
            outs, ns = model.apply_window(p_, w, s, producer_clamp=True)
            return (sum(jnp.sum(o) for o in outs)
                    + sum(jnp.sum(h) + jnp.sum(c) for h, c in ns))

        compiled = step.lower(params, window, states).compile()
    if args.dump_hlo:
        with open(args.dump_hlo, "w") as f:
            f.write(compiled.as_text())
        print(f"optimized HLO -> {args.dump_hlo} (device not touched)")
        return
    if args.clip:
        durs = capture_trace(lambda: step(params, clip))
    else:
        durs = capture_trace(lambda: step(params, window, states))
    report(compiled.as_text(), durs, args.top, json_out=args.json)


if __name__ == "__main__":
    main()
