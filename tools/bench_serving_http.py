#!/usr/bin/env python
"""End-to-end HTTP serving benchmark (VERDICT r3 weak #6).

Measures per-key delivery latency THROUGH the socket for N concurrent 720p
streams against the bin-tpu-serve daemon, and — in the same process/session,
so the pair is comparable despite cross-session tunnel drift (BASELINE.md
"±40%") — the direct StreamingSession control with the identical
(async_drain, emit_u8) configuration.  The delta is the HTTP layer's tax.

Usage:
  python tools/bench_serving_http.py [--weights weights/prf_ema_r4.npz]
      [--streams 2] [--keys 16] [--size 720 1280] [--set k=v ...]

Prints one JSON line:
  {"http_ms_per_key": ..., "direct_ms_per_key": ..., "http_overhead": ...}
"""

from __future__ import annotations

import os as _os
import sys as _sys

# tools/ scripts must run without the editable install (a VM reset wipes
# site-packages): put the repo root ahead of sys.path[0]=tools/.
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import json
import threading
import time

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--weights", default="",
                    help=".npz release; empty = random-init flagship "
                         "(latency does not depend on weight values)")
    ap.add_argument("--preset", default="config3_prf")
    ap.add_argument("--set", dest="overrides", action="append", default=[])
    ap.add_argument("--streams", type=int, default=2)
    ap.add_argument("--keys", type=int, default=16,
                    help="key frames pushed per stream")
    ap.add_argument("--warmup-keys", type=int, default=4,
                    help="leading keys excluded from the steady-state mean "
                         "(first push compiles; early pipeline fill differs)")
    ap.add_argument("--size", type=int, nargs=2, default=(720, 1280),
                    metavar=("H", "W"))
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()

    from bin_tpu.cli import _apply_platform
    _apply_platform(args.platform)
    from bin_tpu.utils.compile_cache import enable_persistent_cache
    enable_persistent_cache()

    import jax

    from bin_tpu.registry import build_model
    from bin_tpu.serving.server import FrameServer, make_http_server

    if args.weights:
        from bin_tpu.benchmark import SERVING_MODE, load_auto_overrides
        from bin_tpu.config import apply_model_overrides
        from bin_tpu.weights import load_weights
        params, model_cfg, _meta = load_weights(args.weights)
        # The card stores the TRAINING config (fp32, no int8). Measure the
        # DEPLOYMENT graph instead: the same serving mode bench.py runs
        # (SERVING_MODE + measurement-gated auto-overrides, provenance-
        # checked against THESE weights), with user --set entries last so
        # any knob can still be pinned for an A/B.  Round-5 lesson:
        # without this, the serving re-record silently measured the fp32
        # training graph off the card.
        serving_mode = list(SERVING_MODE)
        auto, auto_note = load_auto_overrides(weights_path=args.weights)
        serving_mode += auto + args.overrides
        model_cfg = apply_model_overrides(model_cfg, serving_mode)
        model = build_model(model_cfg)
        print(f"weights: {args.weights}")
        print(f"serving mode: {serving_mode}"
              + (f" (auto: {auto_note})" if auto_note else ""))
    else:
        from bin_tpu.config import get_config
        cfg = get_config(args.preset, args.overrides)
        model = build_model(cfg)
        h, w = args.size
        params = model.init(jax.random.key(0), height=h, width=w)
        print(f"weights: random init ({args.preset})")
    params = jax.device_put(params)

    h, w = args.size
    rng = np.random.default_rng(0)
    frames = rng.integers(0, 256, (args.keys, h, w, 3), dtype=np.uint8)

    # warm the device->host bulk path BEFORE the timed region: the tunnel's
    # first big fetch of a process costs ~200-300 s (device_warmup.py) and
    # lands on whichever arm runs first — it contaminated three round-4
    # runs as a "~300 s stall at key 13" before being isolated
    from bin_tpu.utils.device_warmup import warm_d2h
    dt = warm_d2h()
    print(f"d2h warmup: {dt:.2f}s (excluded from both arms)")

    # Pre-compile EVERY stream program before either timed arm: the push
    # program compiles on key 0, but the emission programs compile at the
    # pipeline depths where they first fire (keys 4-5 for the flagship) —
    # round-5 found them as ~35 s mid-stream stalls INSIDE the steady-state
    # window that --warmup-keys could not exclude.  One throwaway session
    # through push/poll/flush/drain populates the in-process compile cache
    # for both arms (HTTP server threads share this process).
    from bin_tpu.evaluation.streaming import StreamingSession
    t0 = time.monotonic()
    wsess = StreamingSession(model, params, batch=1, height=h, width=w,
                             emit_u8=True, async_drain=True)
    for i in range(min(args.keys, 8)):
        wsess.push(frames[i][None])
        wsess.poll()
    wsess.flush()
    wsess.drain()
    del wsess
    print(f"program warmup: {time.monotonic() - t0:.2f}s "
          "(all stream programs compiled before the timed arms)")

    server = FrameServer(model, params, max_streams=args.streams)
    httpd = make_http_server(server, "127.0.0.1", 0)
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()

    from bin_tpu.serving.client import StreamClient

    def run_stream(latencies: list, delivered: list, server_ms: list) -> None:
        client = StreamClient("127.0.0.1", port, timeout=600)
        sid = client.open(h, w)
        got = 0
        for i in range(args.keys):
            t0 = time.monotonic()
            got += len(client.push(sid, frames[i]))
            latencies.append(time.monotonic() - t0)
            server_ms.append(client.last_server_ms)
        got += len(client.close(sid))
        delivered.append(got)
        client.disconnect()

    # ---- HTTP arm: N concurrent client threads over the socket ----------
    lat: list[list[float]] = [[] for _ in range(args.streams)]
    srv: list[list] = [[] for _ in range(args.streams)]
    delivered: list[int] = []
    threads = [threading.Thread(target=run_stream,
                                args=(lat[i], delivered, srv[i]))
               for i in range(args.streams)]
    t0 = time.monotonic()
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    http_wall = time.monotonic() - t0
    steady = [v for ls in lat for v in ls[args.warmup_keys:]]
    http_ms = 1e3 * float(np.mean(steady))
    httpd.shutdown()

    # ---- direct control: same sessions, no socket ------------------------
    from bin_tpu.evaluation.streaming import StreamingSession

    sessions = [StreamingSession(model, params, batch=1, height=h, width=w,
                                 emit_u8=True, async_drain=True)
                for _ in range(args.streams)]
    direct_lat: list[float] = []

    def run_direct(s) -> None:
        for i in range(args.keys):
            t0 = time.monotonic()
            s.push(frames[i][None])
            s.poll()
            dt = time.monotonic() - t0
            if i >= args.warmup_keys:
                direct_lat.append(dt)
        s.flush()
        s.drain()

    threads = [threading.Thread(target=run_direct, args=(s,))
               for s in sessions]
    t0 = time.monotonic()
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    direct_wall = time.monotonic() - t0
    direct_ms = 1e3 * float(np.mean(direct_lat))

    out_frames = sum(delivered)
    print(json.dumps({
        "streams": args.streams, "keys": args.keys, "size": [h, w],
        "http_ms_per_key": round(http_ms, 1),
        "direct_ms_per_key": round(direct_ms, 1),
        "http_overhead": round(http_ms / direct_ms - 1.0, 4),
        "http_wall_s": round(http_wall, 2),
        "direct_wall_s": round(direct_wall, 2),
        "frames_delivered_http": out_frames,
        # per-key trajectories: a steady mean hides backlog growth (a ramp
        # here means pushes outpace the device and latency is queueing)
        "http_lat_ms": [[round(1e3 * v, 1) for v in ls] for ls in lat],
        # server-side (push_ms, poll_ms) per key — splits each http_lat_ms
        # entry into device dispatch vs ready-frame fetch vs (the remainder)
        # transport; the round-4 ~300 s key-13 stall hunt needs this
        "server_ms": [[list(v) if v else None for v in ls] for ls in srv],
        "direct_lat_ms": [round(1e3 * v, 1) for v in direct_lat],
    }))


if __name__ == "__main__":
    main()
