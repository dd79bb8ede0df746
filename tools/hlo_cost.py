#!/usr/bin/env python
"""Static cost rollup of a dumped scheduled HLO module (tools/attribute_trace.py
--dump-hlo output): sum the TPU compiler's own ``estimated_cycles`` per entry
instruction, bucketed by opcode class. The estimate is the compiler's cost
model, not a measurement — but it is layout-aware, so it ranks layout-thrash
fixes correctly WITHOUT chip time (the round-4 audit showed the measured copy
pools and the estimated ones agree within ~15%). Chip A/B still decides.

Usage: python tools/hlo_cost.py runs/hlo_a.txt [runs/hlo_b.txt]
       (two files -> side-by-side delta table)
"""

import json
import re
import sys
from collections import defaultdict

_INSTR = re.compile(
    r"^\s*(?:ROOT\s+)?%?([\w.\-]+)\s*=\s*(\(?[\w\[\],{}:()\s]*?\)?)\s+"
    r"([\w\-]+)\(")
_CYCLES = re.compile(r'"estimated_cycles":"(\d+)"')
_SHAPE = re.compile(r"(\w+)\[([\d,]*)\](?:\{([\d,]+))?")
_CONV = re.compile(r"\bconvolution\(")

V5E_GHZ = 0.94  # v5e TensorCore clock, for a rough cycles->ms rendering


def parse(path):
    """-> (rows, conv_comps): rows = [(name, opcode, cycles, typestr)] for
    ENTRY instructions; conv_comps = set of fused computations that contain
    a convolution (so their fusions bucket as 'conv')."""
    txt = open(path).read()
    conv_comps = set()
    cur, in_entry = None, False
    rows = []
    for raw in txt.splitlines():
        ls = raw.strip()
        mc = re.match(r"(ENTRY\s+)?%?([\w.\-]+)\s+\(.*\)\s+->\s+.*{\s*$", ls)
        if mc:
            cur, in_entry = mc.group(2), bool(mc.group(1))
            continue
        if ls == "}":
            cur, in_entry = None, False
            continue
        if cur is None:
            continue
        if _CONV.search(ls):
            conv_comps.add(cur)
        if not in_entry:
            continue
        mi = _INSTR.match(ls)
        if not mi:
            continue
        name, rtype, opcode = mi.groups()
        mcy = _CYCLES.search(ls)
        cycles = int(mcy.group(1)) if mcy else 0
        mcall = re.search(r"calls=%?([\w.\-]+)", ls)
        m = _SHAPE.search(rtype)
        tstr = f"{m.group(1)}[{m.group(2)}]{{{m.group(3)}}}" if m else "?"
        rows.append((name, opcode, cycles, tstr,
                     mcall.group(1) if mcall else None))
    return rows, conv_comps


def bucket(rows, conv_comps):
    """opcode class -> cycles. Fusions containing a conv count as 'conv';
    everything whose opcode is pure data movement gets its own bucket."""
    out = defaultdict(int)
    for name, opcode, cycles, tstr, called in rows:
        if called and called in conv_comps:
            out["conv fusion"] += cycles
        elif opcode in ("copy", "transpose"):
            out["copy/transpose"] += cycles
        elif opcode in ("slice", "pad", "concatenate", "reshape",
                        "dynamic-slice", "dynamic-update-slice"):
            out["pad/slice/concat"] += cycles
        elif opcode == "fusion":
            out["nonconv fusion"] += cycles
        else:
            out[opcode] += cycles
    return out


def top_movement(rows, conv_comps, n=14):
    mv = [(c, nm, op, t) for nm, op, c, t, called in rows
          if c and (op in ("copy", "transpose", "slice", "pad", "concatenate")
                    or (op == "fusion" and called not in conv_comps))]
    return sorted(mv, reverse=True)[:n]


def ms(cycles):
    return cycles / (V5E_GHZ * 1e9) * 1e3


def main():
    paths = sys.argv[1:]
    assert paths, __doc__
    parsed = [parse(p) for p in paths]
    buckets = [bucket(r, cc) for r, cc in parsed]
    keys = sorted({k for b in buckets for k in b},
                  key=lambda k: -buckets[0].get(k, 0))
    hdr = f"{'bucket':20s}" + "".join(f" {p.split('/')[-1][:24]:>26s}"
                                      for p in paths)
    print(hdr)
    tot = [sum(b.values()) for b in buckets]
    for k in keys:
        line = f"{k:20s}"
        for b in buckets:
            c = b.get(k, 0)
            line += f" {ms(c):9.2f}ms {100*c/max(sum(b.values()),1):5.1f}%{'':9s}"
        print(line)
    print(f"{'TOTAL (est.)':20s}" +
          "".join(f" {ms(t):9.2f}ms {'':15s}" for t in tot))
    for p, (rows, cc) in zip(paths, parsed):
        print(f"\ntop data-movement instructions — {p}:")
        for c, nm, op, t in top_movement(rows, cc):
            print(f"  {ms(c):7.3f} ms {op:12s} {nm[:22]:22s} {t}")


if __name__ == "__main__":
    main()
