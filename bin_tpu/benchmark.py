#!/usr/bin/env python
"""Benchmark: frames/sec/chip at 720p joint deblur + 2x interpolation.

Prints exactly ONE JSON line on stdout:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...}
Everything else goes to stderr.

Metric definition (BASELINE.json:2): assembled OUTPUT frames (deblurred keys
+ interpolated midpoints, 1280x720) produced per second on one chip by the
flagship PRF model (2-level pyramid + cycle level + inter-pyramid ConvLSTM),
bf16 compute, streaming sliding-window inference.

Flagship-of-record (round 3): stem_factor=2 / base_features=128 — the
architecture that holds the QUALITY claim. The stem-4/base-256 variant is
~36% faster but trained 0.87 dB worse on the pinned textured benchmark
with two near-divergences (BASELINE.md round 3); the driver's north-star
couples speed and quality in one model, so the bench defaults to the
model the quality evidence lives on. --stem 4 --base 256 reproduces the
throughput-variant number.

Default serving mode (round 3): scoped int8 PTQ on the wide convs
(model.conv_int8=true, conv_int8_min_cin=256) — measured +12% fps over
pure bf16 with the trained checkpoint's pinned-protocol eval moving by
0.0004 dB (28.3989 vs 28.3993 bf16; 0.009 dB vs fp32 — identical to
plain bf16's own distance from fp32, far inside the 0.05 dB budget).
``--set model.conv_int8=false`` reproduces the pure-bf16 number.

vs_baseline derivation (documented, since no reference numbers are
recoverable — BASELINE.md): the reference is the same architecture in eager
PyTorch on an A100.  Its throughput is estimated as
    a100_fps = A100_PEAK_FLOPS * EAGER_MFU / flops_per_output_frame
with A100 dense bf16 peak 312 TFLOP/s and an assumed eager-mode conv-net
MFU of 0.25 (typical for unfused eager CNN pipelines), and
flops_per_output_frame measured via XLA cost analysis of the MODEL's math
(same architecture → same FLOPs).  vs_baseline = our_fps / a100_fps; the
driver target (BASELINE.json:5) of ">=1.2x A100-equivalent" is met when
vs_baseline >= 1.2.

FLOP accounting (VERDICT r4 missing #3): the SHIPPING graph implements
depth/space-to-depth as one-hot helper convolutions (a TPU layout trick,
ops/pixel_shuffle.py) whose MACs the eager reference performs as a free
reshape view.  Counting those phantom FLOPs into the denominator would
inflate the estimated A100 work term, so the denominator is lowered from
the bit-exact RESHAPE-form graph (all pack/unpack impl flags off) —
``model_flops`` — while the shipping graph's count is reported alongside
as ``graph_flops`` for transparency.  vs_baseline and mfu_sensitivity use
``model_flops`` only.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

A100_PEAK_FLOPS = 312e12
EAGER_MFU = 0.25


def log(*args):
    print(*args, file=sys.stderr, flush=True)


def wait_for_device(deadline_s: float = 1800.0, probe_timeout_s: float = 300.0):
    """Block until the accelerator backend initializes, with a bounded wait.

    Failure detection at the bench boundary (SURVEY.md §6.3): the axon PJRT
    tunnel is observed to go UNAVAILABLE between sessions (errors fast) or to
    wedge (``jax.devices()`` blocks >10 min without returning). Probing in a
    SUBPROCESS with a hard timeout covers both modes; retrying inside the
    deadline rides out a transient outage so a round-end bench still lands.
    Returns True when a probe succeeds; False if the deadline expires (the
    caller proceeds anyway and fails with the real error, which is the most
    informative outcome at that point). No-op cost when the device is up:
    one ~15 s subprocess probe, nothing in the timed region.
    """
    import os
    import subprocess

    if deadline_s <= 0:
        return True
    t0 = time.monotonic()
    attempt = 0
    while True:
        attempt += 1
        try:
            # NB: this environment's site hook ignores the JAX_PLATFORMS env
            # var (SURVEY.md §5) — apply it in-process so a test can point
            # the probe at cpu; unset, the probe exercises the real backend.
            probe_code = (
                "import os, jax\n"
                "p = os.environ.get('JAX_PLATFORMS', '')\n"
                "if p: jax.config.update('jax_platforms', p)\n"
                "print(jax.devices()[0].platform)\n")
            # clamp each probe to the time left (plus slack), so a small
            # --device-wait really bounds the wall clock even when the
            # first probe wedges; floor of 20 s lets a healthy backend
            # finish its ~15 s tunnel init.
            this_timeout = max(
                20.0, min(probe_timeout_s,
                          deadline_s - (time.monotonic() - t0) + 5.0))
            r = subprocess.run(
                [sys.executable, "-c", probe_code],
                timeout=this_timeout, capture_output=True, text=True,
                env=os.environ.copy())
            if r.returncode == 0:
                if attempt > 1:
                    log(f"device back after {time.monotonic() - t0:.0f}s "
                        f"({attempt} probes)")
                return True
            err = (r.stderr or "").strip().splitlines()
            err = err[-1] if err else "?"
        except subprocess.TimeoutExpired:
            err = f"probe wedged >{this_timeout:.0f}s (killed)"
        waited = time.monotonic() - t0
        if waited >= deadline_s:
            log(f"device still unavailable after {waited:.0f}s: {err}")
            return False
        log(f"device probe {attempt} failed ({err}); retrying "
            f"({deadline_s - waited:.0f}s left)")
        time.sleep(min(60.0, max(5.0, deadline_s - waited)))


def best_pinned_release():
    """(repo-relative path, card metadata) of the committed release with the
    highest psnr_overall measured under the PINNED eval protocol, or None.

    The single definition of "the quality record": release_quality_note and
    tools/run_experiment.sh's record-floor picker both resolve through it,
    so a card evaluated under a different protocol (e.g. 352x640, ~2 dB
    higher for protocol reasons alone) can neither inflate the bench note
    nor silently become every experiment's promotion gate."""
    import glob

    from bin_tpu.weights import read_card
    # tools/quality_eval.py defaults = the repo's pinned protocol
    PINNED = {"size": [256, 256], "clips": 16, "keys": 12, "seed": 9999}
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    best = None
    for p in sorted(glob.glob(os.path.join(repo, "weights", "*.npz")),
                    key=os.path.getmtime, reverse=True):
        try:
            meta = read_card(p)["metadata"]
        except Exception:
            continue
        psnr = meta.get("psnr_overall")
        proto = meta.get("eval_protocol") or {}
        if any(proto.get(k) != v for k, v in PINNED.items()):
            continue
        if isinstance(psnr, float) and (
                best is None or psnr > best[1]["psnr_overall"]):
            best = (os.path.relpath(p, repo), meta)
    return best


def release_quality_note() -> str:
    """Quality note derived from the committed release card — NOT hand-written
    (VERDICT r3 weak #2: the round-3 note cited a destroyed checkpoint).
    Picks the weights/*.npz card with the HIGHEST psnr_overall — the quality
    record — not the newest file: round 4's int8-QAT export briefly made a
    side experiment (-0.26 dB, verdict flip=false) the newest card and the
    bench note silently downgraded itself to the losing number.

    Only cards measured under the PINNED protocol compete (ADVICE r4): a
    card whose headline eval ran at, say, 352x640 scores ~2 dB higher for
    protocol reasons alone and would win on a non-comparable number."""
    best = best_pinned_release()
    if best is None:
        return ("no committed release carries quality provenance "
                "(weights/*.npz cards lack psnr_overall)")
    rel, meta = best
    proto = meta.get("eval_protocol", {})
    size = "x".join(str(s) for s in proto.get("size", []))
    return (f"release {rel}: {meta['psnr_overall']:.2f} dB / "
            f"{meta.get('ssim_overall', float('nan')):.4f} SSIM pinned "
            f"{size} clips={proto.get('clips')} keys={proto.get('keys')} "
            f"seed={proto.get('seed')} dtype={proto.get('dtype')} "
            f"params={proto.get('params')} (from the committed model card)")


# The default deployment ("serving") mode — bench.py's built-ins.  ONE
# definition: tools/bench_serving_http.py and tools/run_experiment.sh's
# effective-mode eval import it, so the three consumers cannot drift and
# silently measure/gate a different graph than bench.py (the round-5
# "serving re-record measured the fp32 training graph" failure class).
SERVING_MODE = ("model.dtype=bfloat16", "model.conv_int8=true",
                "model.conv_int8_min_cin=256")


def load_auto_overrides(path: str | None = None,
                        weights_path: str | None = None):
    """Measurement-gated default upgrades for unattended benches.

    Automated experiments (e.g. the queue8 int8-QAT fine-tune) drop
    serving-mode overrides into runs/BENCH_OVERRIDES.json ONLY after their
    quality eval passes the 0.05 dB budget, so a round-end bench measures
    the faster mode the moment it is proven free.  Returns
    (override_strings, provenance_note | None); the note goes verbatim
    into the output JSON so the record is self-explaining.

    ``weights_path``: when the caller serves SPECIFIC weights (the HTTP
    serving bench / daemon), pass them so checkpoint-specific overrides
    can be provenance-checked — a static int8 activation-scales sidecar
    calibrated on one release must not silently drive another release's
    quantized graph (the scales encode THAT checkpoint's activation
    ranges; no quality gate ever evaluated the cross pairing).
    """
    if path is None:
        path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                            "runs", "BENCH_OVERRIDES.json")
    if not os.path.exists(path):
        return [], None
    try:
        with open(path) as f:
            spec = json.load(f)
        if not isinstance(spec, dict) or not isinstance(
                spec.get("overrides", {}), dict):
            raise ValueError(f"expected an object with 'overrides', got "
                             f"{type(spec).__name__}")
        ov = spec.get("overrides", {})
        static = ov.get("model.conv_int8_static")
        if static and weights_path:
            from bin_tpu.ops.quant import scales_calibrated_for
            want = os.path.basename(str(weights_path))
            got = scales_calibrated_for(str(static))
            if got is None:  # pre-provenance sidecar: filename convention
                stem = want[:-len(".npz")] if want.endswith(".npz") else want
                got_ok = os.path.basename(str(static)) == f"{stem}.scales.npz"
            else:
                got_ok = got == want
            if not got_ok:
                log(f"dropping model.conv_int8_static={static}: calibrated "
                    f"for {got or 'unknown'}, serving {want} — re-run "
                    "tools/calibrate_int8.py for these weights")
                ov = {k: v for k, v in ov.items()
                      if k != "model.conv_int8_static"}
        strings = []
        for k, v in ov.items():
            if not isinstance(k, str) or isinstance(v, (dict, list)):
                raise ValueError(f"non-scalar override {k!r}={v!r}")
            strings.append(f"{k}={v}")
        note = {"file": os.path.basename(path),
                "reason": spec.get("reason", ""), "overrides": ov}
        log(f"applying measurement-gated overrides: {note}")
        return strings, note
    except Exception as e:  # an unattended bench must NEVER die on a bad
        log(f"ignoring unusable {path}: {e}")  # sidecar, whatever the shape
        return [], None


def _streaming_bench(args, model, params, blurry):
    """End-to-end serving-path benchmark: StreamingSession.push per key,
    INCLUDING the host boundary (pack, upload, emission fetch) — real wall
    clock per emitted output frame, the number a serving deployment sees.

    Emissions stay on device and are fetched in ONE stacked transfer every
    ``--drain-every`` keys (VERDICT r1 item 9): push dispatch is async, so
    only the periodic drain pays the tunnel round trip."""
    import json
    import time

    from bin_tpu.evaluation.streaming import StreamingSession

    b, k, h, w = blurry.shape[:4]
    # serving input is decoded video = uint8 frames; ship those and let the
    # session normalize on device (4x less tunnel traffic per key)
    blurry = (blurry * 255.0 + 0.5).astype(np.uint8)
    sess = StreamingSession(model, params, batch=b, height=h, width=w,
                            buffer_drain=not args.async_drain, emit_u8=True,
                            async_drain=args.async_drain)
    t0 = time.monotonic()
    for i in range(k):  # warmup pass: fills window, compiles the step
        sess.push(blurry[:, i])
    sess.drain()
    log(f"streaming warmup (compile): {time.monotonic() - t0:.1f}s")

    sess.reset()
    frames_out = 0
    delivered_at: list[float] = []  # wall time when each emission LANDED
    t0 = time.monotonic()
    reps = max(2, args.iters)
    for r in range(reps):
        for i in range(k):
            sess.push(blurry[:, i])
            keys_done = r * k + i + 1
            if args.async_drain:
                got = sess.poll()  # non-blocking: whatever already landed
                frames_out += sum(f.shape[0] for _, f in got)
                delivered_at += [time.monotonic() - t0] * len(got)
            elif keys_done % args.drain_every == 0:
                got = sess.drain()
                frames_out += sum(f.shape[0] for _, f in got)
                delivered_at += [time.monotonic() - t0] * len(got)
    frames_out += sum(f.shape[0] for _, f in sess.drain())
    dt = time.monotonic() - t0
    fps = frames_out / dt
    per_key_ms = dt / (reps * k) * 1e3
    record = {
        "metric": "streaming frames/sec/chip @ 720p joint deblur + 2x interp",
        "value": round(fps, 3),
        "unit": "frames/s",
        "vs_baseline": None,
        "detail": {"batch_streams": b, "per_key_latency_ms": round(per_key_ms, 1),
                   "drain_every": args.drain_every,
                   "async_drain": bool(args.async_drain),
                   # emissions that landed DURING the run (vs the final
                   # blocking drain) — per-key delivery means this ≈ all
                   "frames_landed_during_run": len(delivered_at),
                   "input_dtype": "uint8",
                   "shape": [b, h, w], "dtype": args.dtype},
    }
    print(json.dumps(record), flush=True)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--height", type=int, default=720)
    p.add_argument("--width", type=int, default=1280)
    p.add_argument("--keys", type=int, default=8, help="blurry key frames per clip")
    p.add_argument("--batch", type=int, default=1, help="clips in flight")
    p.add_argument("--iters", type=int, default=5)
    p.add_argument("--warmup", type=int, default=2)
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--stem", type=int, default=2,
                   help="model.stem_factor (default 2: the quality-holding "
                        "flagship; 4 = the faster stem-4 variant)")
    p.add_argument("--base", type=int, default=128,
                   help="model.base_features (default 128, matching stem 2)")
    p.add_argument("--set", dest="overrides", action="append", default=[],
                   metavar="KEY=VALUE", help="config override, e.g. "
                   "model.clamp_intermediate=false (repeatable)")
    p.add_argument("--streaming", action="store_true",
                   help="measure the StreamingSession serving path "
                        "(per-key wall latency incl. host boundary) instead "
                        "of the batch clip scan")
    p.add_argument("--drain-every", type=int, default=8,
                   help="streaming mode: fetch buffered emissions every N "
                        "keys (1 = per-key fetch, the round-1 behavior)")
    p.add_argument("--async-drain", action="store_true",
                   help="streaming mode: background fetch thread overlaps "
                        "device->host transfer with the next key's compute "
                        "(per-key delivery at amortized cost)")
    p.add_argument("--device-wait", type=float, default=1800.0,
                   help="max seconds to wait for the accelerator backend "
                        "before benching (the tunnel can be transiently "
                        "down/wedged between sessions; 0 = no wait)")
    args = p.parse_args(argv)

    ok = wait_for_device(args.device_wait)
    try:
        if not ok:
            # The bounded probe says the backend is down; proceeding into
            # jax.devices() on a WEDGED tunnel blocks unkillably long (the
            # second observed failure mode) and would end the process with
            # no output at all. Fail fast into the error record instead.
            raise RuntimeError(
                f"accelerator backend unavailable after bounded "
                f"{args.device_wait:.0f}s wait (probe timeout/error)")
        _run(args)
    except Exception as e:
        # The driver records bench.py's one JSON line; if the backend is
        # still down at round end (observed: multi-hour tunnel outages,
        # BASELINE.md) dying with no line loses the round's record
        # entirely. Emit an honest zero-value record naming the failure,
        # then still exit nonzero with the real traceback.
        record = {
            "metric": "frames/sec/chip @ 720p joint deblur + 2x interp",
            "value": 0.0,
            "unit": "frames/s",
            "vs_baseline": 0.0,
            "error": f"{type(e).__name__}: {e}"[:400],
            "detail": {"device_wait_succeeded": bool(ok)},
        }
        print(json.dumps(record), flush=True)
        raise


def _run(args):
    import jax
    import jax.numpy as jnp
    from bin_tpu.config import get_config, apply_overrides
    from bin_tpu.models import recurrent
    from bin_tpu.registry import build_model
    from bin_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()
    dev = jax.devices()[0]
    log(f"device: {dev.platform} {getattr(dev, 'device_kind', '?')}")

    # default serving mode (SERVING_MODE: scoped int8 PTQ, see module
    # docstring); the --dtype flag then user --set entries come later
    # and win
    overrides = [s for s in SERVING_MODE if not s.startswith("model.dtype=")]
    overrides.insert(0, f"model.dtype={args.dtype}")
    if args.stem is not None:
        overrides.append(f"model.stem_factor={args.stem}")
    if args.base is not None:
        overrides.append(f"model.base_features={args.base}")
    extra, auto_note = load_auto_overrides()
    overrides += extra
    overrides += args.overrides
    cfg = get_config("config5_v5e_streaming", overrides)
    model = build_model(cfg)

    h, w, k, b = args.height, args.width, args.keys, args.batch
    rng = np.random.default_rng(0)
    params = model.init(jax.random.key(0), batch=1, height=64, width=64)
    blurry = jnp.asarray(rng.uniform(0, 1, (b, k, h, w, 3)).astype(np.float32))

    if args.streaming:
        return _streaming_bench(args, model, params, np.asarray(blurry))

    infer = jax.jit(lambda p, x: model.infer_clip(p, x)[0])

    # Timing methodology: on this environment's experimental PJRT platform
    # (axon tunnel), block_until_ready() does NOT wait for device execution
    # and a host fetch costs tens of ms.  So: run R clip inferences as a
    # device-side lax.scan (serialized by a tiny numerical carry dependency
    # that XLA cannot fold away), fetch one scalar, and take the SLOPE
    # between two scan lengths — overhead and fetch latency cancel.
    import functools

    @functools.partial(jax.jit, static_argnums=2)
    def chained(p, x, n):
        def body(carry, _):
            video = infer(p, x + carry * jnp.float32(1e-30))
            return jnp.sum(video), None
        out, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=n)
        return out

    t0 = time.monotonic()
    first = float(np.asarray(chained(params, blurry, 1)))
    log(f"compile+first-run: {time.monotonic() - t0:.1f}s (checksum {first:.3e})")

    def timed(n):
        t0 = time.monotonic()
        np.asarray(chained(params, blurry, n))
        return time.monotonic() - t0

    for _ in range(args.warmup):
        timed(1)
    t1 = min(timed(1) for _ in range(3))
    tn = min(timed(args.iters) for _ in range(2))
    dt = max(tn - t1, 1e-9) / (args.iters - 1)

    out_shape = jax.eval_shape(infer, params, blurry).shape
    out_frames = out_shape[0] * out_shape[1]
    fps = out_frames / dt
    log(f"per-clip device time {dt * 1e3:.1f} ms for {out_frames} output "
        f"frames (t1={t1 * 1e3:.0f} ms, t{args.iters}={tn * 1e3:.0f} ms)")

    # FLOPs → A100-equivalent eager reference fps.  XLA cost_analysis counts
    # a lax.scan body ONCE regardless of trip count (verified in this
    # environment), so lower a single WINDOW step and multiply by the number
    # of windows instead of lowering the scanned clip program.
    #
    # TWO counts are taken (module docstring "FLOP accounting"):
    #   graph_flops — the shipping graph, incl. one-hot d2s/s2d helper-conv
    #     MACs (layout trick; phantom work the eager reference does as a
    #     free view);
    #   model_flops — the bit-exact reshape-form graph (pack/unpack impl
    #     flags forced off), the architecture's real math.
    # The A100 denominator uses model_flops.
    vs_baseline = None
    flops_per_frame = flops_per_frame_graph = None
    try:
        from bin_tpu.models.recurrent import num_windows
        n_win = num_windows(k, cfg.model.window_size)
        window = blurry[:, : cfg.model.window_size]
        states = model.initial_state(b, h, w)

        def window_flops_of(m):
            def one_window(p, w, s):
                outs, ns = m.apply_window(p, w, s)
                return (sum(jnp.sum(o) for o in outs)
                        + sum(jnp.sum(x) + jnp.sum(c) for x, c in ns))
            cost = (jax.jit(one_window).lower(params, window, states)
                    .compile().cost_analysis())
            return float(cost.get("flops", 0.0))

        graph_window_flops = window_flops_of(model)
        try:
            math_cfg = get_config("config5_v5e_streaming", overrides + [
                "model.d2s_via_conv=false", "model.s2d_via_conv=false",
                "model.d2s_final_via_conv=false"])
            model_window_flops = window_flops_of(build_model(math_cfg))
        except Exception as e:
            log(f"reshape-form lowering failed ({e}); falling back to "
                f"graph flops for the denominator")
            model_window_flops = graph_window_flops
        if model_window_flops > 0:
            flops_per_frame = model_window_flops * n_win / out_frames
            flops_per_frame_graph = graph_window_flops * n_win / out_frames
            a100_fps = A100_PEAK_FLOPS * EAGER_MFU / flops_per_frame
            vs_baseline = fps / a100_fps
            log(f"model window flops {model_window_flops:.3e} x {n_win} "
                f"windows -> {flops_per_frame:.3e}/output-frame "
                f"(shipping graph: {flops_per_frame_graph:.3e}, "
                f"+{(flops_per_frame_graph / flops_per_frame - 1) * 100:.1f}% "
                f"helper-conv overhead); effective "
                f"{flops_per_frame * fps / 1e12:.1f} model-TFLOP/s; "
                f"estimated eager-A100 fps: {a100_fps:.2f}")
    except Exception as e:  # cost analysis is best-effort on experimental PJRT
        log(f"cost_analysis unavailable: {e}")

    record = {
        "metric": "frames/sec/chip @ 720p joint deblur + 2x interp",
        "value": round(fps, 3),
        "unit": "frames/s",
        "vs_baseline": round(vs_baseline, 3) if vs_baseline else None,
        "vs_baseline_estimated": True,  # no measured reference exists (empty
        # mount, BASELINE.md); denominator is an ASSUMED 25%-MFU eager A100.
        "auto_overrides": auto_note,  # measurement-gated defaults, if any
        "detail": {
            "shape": [b, k, h, w],
            "dtype": args.dtype,
            "model": (f"prf stem{cfg.model.stem_factor}/"
                      f"base{cfg.model.base_features}"
                      + (f" int8(min_cin={cfg.model.conv_int8_min_cin})"
                         if cfg.model.conv_int8 else " bf16-only")),
            "quality_note": release_quality_note(),
            "median_ms": round(dt * 1e3, 2),
            # model_flops: the architecture's real math (reshape-form
            # lowering) — the vs_baseline denominator.  graph_flops: the
            # shipping graph incl. one-hot layout-helper convs.
            "flops_per_output_frame": flops_per_frame,
            "flops_per_output_frame_graph": flops_per_frame_graph,
            "baseline_model": f"A100 eager est. ({EAGER_MFU:.0%} MFU of "
                              f"{A100_PEAK_FLOPS / 1e12:.0f} TFLOP/s)",
            # Sensitivity: vs_baseline scales as 0.25/assumed_MFU. The >=1.2
            # target holds for assumed eager MFU up to vs_baseline/1.2*0.25
            # (e.g. vs_baseline 1.76 -> holds through 37% eager MFU).
            "mfu_sensitivity": (
                round(vs_baseline / 1.2 * EAGER_MFU, 3) if vs_baseline else None),
        },
    }
    print(json.dumps(record), flush=True)


if __name__ == "__main__":
    main()
