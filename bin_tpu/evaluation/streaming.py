"""Streaming inference session: constant-latency joint deblur + 2x interp
over an unbounded video stream.

The whole-clip path (Model.infer_clip) scans a finite clip; serving needs
the other shape: key frames arrive one at a time, and after each arrival
the session emits the newly-determined output frames.  This is the direct
product form of the reference's sliding-window eval loop (SURVEY.md §4.2)
with the ConvLSTM carries held on-device between calls.

Per key-frame arrival (after the first window fills):
  window  = last `window_size` keys
  pyramid forward (ONE jitted step, reused — no per-window retrace)
  emits   = [centre midpoint (deepest level), 2nd deblurred key (level 2)]
i.e. 2 output frames per input key — exactly 2x rate, with a fixed latency
of window_size-2 key intervals.  The first window additionally emits its
leading frames (times 1..K-2 on the 2x grid).

Batch axis = independent streams (multi-clip streaming, BASELINE.json:11).
"""

from __future__ import annotations

import threading
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from bin_tpu.models.pyramid import level_output_times
from bin_tpu.registry import Model

__all__ = ["StreamingSession"]


def _emit_plan(model: Model, first_window: bool) -> list[tuple[int, int, int]]:
    """(level_idx, pair_idx, local_time) to emit for this window.

    Steady state emits local times {K-2, K-1} — one deblurred key + one
    midpoint per arriving key (exactly 2x rate), each from the DEEPEST
    level predicting that parity and from the latest window containing
    it (max ConvLSTM history; consistent with recurrent.assembly_plan).
    Consecutive windows advance by 2 on the output grid, so emissions
    are contiguous and in order; the first full window back-fills times
    1..K-3.  Latency: 2 key intervals behind the newest input.
    """
    k = model.cfg.window_size
    levels = model.num_levels_total
    times_by_level = {li: level_output_times(li + 1, k)
                      for li in range(levels)}

    def deepest(t):
        for li in range(levels - 1, -1, -1):
            if t in times_by_level[li]:
                return (li, times_by_level[li].index(t), t)
        return None  # e.g. even times in an interp-only 1-level model

    plan = [deepest(t) for t in range(1, k - 2)] if first_window else []
    plan += [deepest(k - 2), deepest(k - 1)]
    return [p for p in plan if p is not None]


def _build_session_programs(model: Model, emit_u8: bool, async_drain: bool):
    """Build the session's three jitted programs + emission plans.

    Module-level (not per-session closures) so they can be SHARED across
    sessions — see _session_programs.  Shapes/shardings are handled by
    jax.jit's own cache, so the only trace-relevant parameters beyond the
    model are emit_u8 and async_drain."""
    import functools

    from bin_tpu.ops.pixel_shuffle import input_pack_fn

    f = model.cfg.stem_factor
    dt = jnp.dtype(model.cfg.dtype)
    pack = input_pack_fn(model.cfg)
    plans = {first: _emit_plan(model, first) for first in (True, False)}

    # a non-default pack impl (A/B flags) must be what serving actually
    # measures — the uint8 fast path below would otherwise silently
    # bypass it (ADVICE r4).  Compare against the DISPATCHED function, not
    # a re-derivation of input_pack_fn's flag logic: a future pack impl
    # flag would otherwise be bypassed for uint8 frames again.
    from bin_tpu.ops.pixel_shuffle import space_to_depth
    custom_pack = pack is not space_to_depth

    def ingest(frame: jax.Array) -> jax.Array:
        # uint8 frames (what a video decoder actually produces) are
        # normalized ON DEVICE: 4x less host→device traffic per key.
        # Packed BEFORE normalizing: space_to_depth is a permutation,
        # so it commutes bit-exactly with the pointwise /255 — and the
        # layout move on uint8 touches half the bytes of bf16 (and the
        # normalize fuses into the head conv's input).
        if frame.dtype == jnp.uint8:
            if custom_pack:
                # normalize first (pointwise commutes bit-exactly with
                # the permutation), then run the CONFIGURED pack on the
                # compute dtype it supports
                return pack((frame.astype(jnp.float32) / 255.0)
                            .astype(dt), f)
            packed = space_to_depth(frame, f)
            return (packed.astype(jnp.float32) / 255.0).astype(dt)
        return pack(frame.astype(dt), f)

    @functools.partial(jax.jit, donate_argnums=(1,))
    def _insert(frame, stack):
        return jnp.concatenate([stack[:, 1:], ingest(frame)[:, None]], 1)

    # The WHOLE per-key path — ingest + window shift + pyramid forward +
    # emission select — is one jitted program: on a tunneled device every
    # eager op is a ~0.5 s round trip, so dispatch count per key, not
    # device FLOPs, dominated the round-1/-2 serving latency
    # (docs/DESIGN.md §4c).
    def _finalize(emitted: jax.Array) -> jax.Array:
        """Packed stacked emissions → delivery format (fp32 or u8).

        u8 mode quantizes IN PACKED DOMAIN and unpacks the uint8
        tensor: depth_to_space is a pure permutation, so it commutes
        bit-exactly with the pointwise clip/scale/round — and the
        full-resolution layout move then touches 1/4 the bytes of the
        old fp32-unpack-then-quantize order (the unpack transpose runs
        at copy speed, so bytes moved IS its cost — round-4 HLO
        audit)."""
        from bin_tpu.ops.pixel_shuffle import depth_to_space

        if emit_u8:
            q = jnp.round(
                jnp.clip(emitted.astype(jnp.float32), 0.0, 1.0) * 255.0
            ).astype(jnp.uint8)
            return depth_to_space(q, model.cfg.stem_factor)
        return model.unpack(emitted)

    @functools.partial(jax.jit, static_argnums=(4,), donate_argnums=(2, 3))
    def _step_emit(params, frame, stack, states, first: bool):
        stack = jnp.concatenate([stack[:, 1:], ingest(frame)[:, None]], 1)
        outputs, new_states = model.apply_window(params, stack, states,
                                                 producer_clamp=True)
        emitted = jnp.stack(
            [outputs[li][:, j] for li, j, _ in plans[first]])
        if async_drain:
            # finalize in-step: the fetch thread then needs zero extra
            # dispatches, keeping serving at ONE dispatch per key
            emitted = _finalize(emitted)
        return emitted, stack, new_states, outputs

    return _insert, _step_emit, jax.jit(_finalize), plans


_session_programs_lock = threading.Lock()


def _session_programs(model: Model, emit_u8: bool, async_drain: bool):
    """The jitted session programs, cached ON THE MODEL HANDLE.

    Round-5 serving finding (runs/serving_http_r5b.json): when these were
    per-session closures, every new StreamingSession created fresh
    jax.jit entries, so the bench's pre-compile warmup session did NOT
    warm the server's (or the direct control's) sessions — each fresh
    session paid ~5-10 s of persistent-cache deserialization at its first
    push/first emission, mid-stream.  Caching per (model, emit_u8,
    async_drain) makes every same-config session share one set of
    programs: the first session compiles, the rest reuse.  The cache
    lives in the Model handle's __dict__ (frozen dataclass, so via
    object.__setattr__), tying program lifetime to the model.

    Built under a lock: FrameServer.create_stream runs outside the server
    lock in a ThreadingHTTPServer, so two clients opening streams
    concurrently on a fresh server would otherwise both miss the cache
    and each build (and later pay first-compile for) their own program
    set — the very duplication this cache removes."""
    key = (bool(emit_u8), bool(async_drain))
    with _session_programs_lock:
        cache = model.__dict__.get("_stream_programs")
        if cache is None:
            cache = {}
            object.__setattr__(model, "_stream_programs", cache)
        if key not in cache:
            cache[key] = _build_session_programs(model, *key)
        return cache[key]


class StreamingSession:
    """Streaming joint deblur + 2x interp with DEVICE-RESIDENT emissions.

    ``push`` returns (time, frame) pairs whose frames are unpacked jax
    arrays still on device — dispatch is async, so push() itself does not
    wait for the step.  Fetch to host happens either lazily (the caller
    materializes a frame) or in one batched transfer via ``drain()`` —
    on a tunneled device, one stacked fetch of N frames costs one round
    trip instead of N (VERDICT r1 item 9)."""

    def __init__(self, model: Model, params: Any, batch: int, height: int,
                 width: int, buffer_drain: bool = False,
                 emit_u8: bool = False, plan=None,
                 async_drain: bool = False):
        """``buffer_drain``: retain emissions on device for batched fetch via
        drain(); push() then returns [] (serving mode — ONE device dispatch
        per key, one stacked fetch per drain).  Off by default: push()
        returns unpacked device frames directly (interactive mode).

        ``emit_u8``: drain() quantizes to uint8 ON DEVICE before fetching —
        4x less device→host traffic; display/encode sinks consume uint8
        anyway.

        ``plan`` (MeshPlan): shard the session over a device mesh — the
        batch axis is independent streams, so multi-stream serving scales
        across chips by sharding it over 'data' (params replicated, window
        stack + ConvLSTM carries sharded with the streams; XLA keeps every
        per-stream op local, no collectives in the hot path).  ``batch``
        must divide evenly over the mesh's data axis.  A mesh with a
        'spatial' axis > 1 additionally shards activation HEIGHT, the
        single-stream latency lever: one 720p stream can then spread over
        several chips (XLA inserts conv halo exchanges over ICI) — the
        reference's DataParallel has no analog (SURVEY.md §6.7-6.8).

        ``async_drain``: per-KEY delivery without paying the fetch round
        trip on the critical path (VERDICT r2 item 8).  The emissions are
        FINALIZED (unpacked + optionally uint8-quantized) inside the same
        single jitted step, then handed to a background fetch thread whose
        only job is ``jax.device_get`` — so the next key's dispatch
        overlaps the previous key's device→host transfer.  Consume with
        ``poll()`` (non-blocking, frames ready so far) and a final
        ``drain()`` (blocks for in-flight).  push() returns []."""
        self.model = model
        self._plan = plan
        if plan is not None:
            if batch % plan.num_data:
                raise ValueError(f"batch {batch} streams must divide over "
                                 f"data={plan.num_data} mesh axis")
            if (plan.num_spatial > 1
                    and (height // model.cfg.stem_factor) % plan.num_spatial):
                raise ValueError(
                    f"packed height {height}//{model.cfg.stem_factor} must "
                    f"divide over spatial={plan.num_spatial} mesh axis")
            params = jax.device_put(params, plan.replicated())
        self.params = params
        self.k = model.cfg.window_size
        self.batch, self.height, self.width = batch, height, width
        self.buffer_drain = buffer_drain
        self.emit_u8 = emit_u8
        self.async_drain = async_drain
        # jitted programs + emission plans are per-MODEL (shared across
        # sessions), not per-session closures — see _session_programs
        (self._insert, self._step_emit, self._finalize_jit,
         self._plans) = _session_programs(model, emit_u8, async_drain)

        f = model.cfg.stem_factor
        self._stack_shape = (batch, self.k, height // f, width // f, 3 * f * f)
        self._stack_dtype = jnp.dtype(model.cfg.dtype)

        if async_drain:
            import queue
            import threading
            # Pipeline depth 2: one window in compute + one finalized output
            # in device->host flight.  Deeper queues buy NOTHING (the chip
            # computes one window at a time) and are actively catastrophic
            # on the tunneled device: with depth 8, pushes return in ~1 ms
            # until the queue fills and then the first device_get pays one
            # giant sync for the whole backlog — measured 41 s at key 12
            # for a single 720p stream and 228-316 s for two concurrent
            # streams (16 deep-queued windows of donated stacks/outputs;
            # runs/serving_http_r4_instrumented.json, X-Push-Ms split).
            # Depth 2 converts that cliff into gentle per-window
            # backpressure: each push blocks ~one window-time once the
            # pipeline fills — bounded serving latency, same throughput.
            self._fetch_q: queue.Queue = queue.Queue(maxsize=2)
            self._ready: list[tuple[int, np.ndarray]] = []
            self._ready_lock = threading.Lock()

            def _fetch_loop():
                while True:
                    item = self._fetch_q.get()
                    if item is None:  # close() sentinel
                        self._fetch_q.task_done()
                        return
                    times, dev = item
                    try:
                        host = np.asarray(jax.device_get(dev))  # (E, B, H, W, 3)
                        with self._ready_lock:
                            self._ready.extend(zip(times, host))
                    finally:
                        self._fetch_q.task_done()

            self._fetcher = threading.Thread(target=_fetch_loop, daemon=True,
                                             name="bin-tpu-stream-fetch")
            self._fetcher.start()
        self.reset()

    def _shard(self, x) -> jax.Array:
        """Session-array sharding: batch (streams) over 'data'; with a
        spatial mesh axis, activation height too where it divides — deep
        ConvLSTM carries often can't and stay replicated along 'spatial'
        (MeshPlan.activation holds the rule)."""
        return jax.device_put(x, self._plan.activation(x))

    def reset(self) -> None:
        """New stream(s): clear ConvLSTM carries and the frame window."""
        self.states = self.model.initial_state(self.batch, self.height,
                                               self.width)
        self._stack = jnp.zeros(self._stack_shape, self._stack_dtype)
        if self._plan is not None:
            self.states = jax.tree.map(self._shard, self.states)
            self._stack = self._shard(self._stack)
        self._keys_seen = 0
        self._last_outputs = None
        self._last_start_t = 0
        # pending emissions: (times, (E, B, h, w, C) packed device array)
        self._pending: list[tuple[list[int], jax.Array]] = []
        if self.async_drain:
            self._fetch_q.join()  # let in-flight fetches land, then discard
            with self._ready_lock:
                self._ready.clear()

    def close(self) -> None:
        """Stop the async fetch thread (async mode).  A session holds
        device-resident buffers alive through the thread's closure, so
        long-running owners (the serving daemon) must close sessions they
        retire — a daemon thread alone never exits and would leak one OS
        thread + the session's device arrays per stream ever created."""
        if self.async_drain and self._fetcher.is_alive():
            self._fetch_q.put(None)
            self._fetcher.join(timeout=60)

    def poll(self) -> list[tuple[int, np.ndarray]]:
        """Async mode: frames whose device→host transfer has completed —
        non-blocking, in time order.  Empty in other modes (use drain)."""
        if not self.async_drain:
            return []
        with self._ready_lock:
            out, self._ready = self._ready, []
        return sorted(out, key=lambda tf: tf[0])

    def drain(self) -> list[tuple[int, np.ndarray]]:
        """Fetch every pending emission and return (time, (B, H, W, 3)
        numpy) pairs in time order — fp32 in [0, 1], or uint8 with
        ``emit_u8`` (quantized on device).

        buffer mode: ONE stacked device→host transfer of everything
        pending.  async mode: block until the background fetches land,
        then hand over whatever poll() hasn't returned yet."""
        if self.async_drain:
            self._fetch_q.join()
            return self.poll()
        if not self._pending:
            return []
        times = [t for ts, _ in self._pending for t in ts]
        packed = jnp.concatenate([e for _, e in self._pending], axis=0)
        if self.emit_u8:
            # quantize in packed domain, unpack the uint8 tensor — same
            # permutation-commutes-with-pointwise argument as _finalize
            from bin_tpu.ops.pixel_shuffle import depth_to_space
            q = jnp.round(
                jnp.clip(packed.astype(jnp.float32), 0.0, 1.0) * 255.0
            ).astype(jnp.uint8)
            stacked = depth_to_space(q, self.model.cfg.stem_factor)
        else:
            stacked = self.model.unpack(packed)
        self._pending = []
        host = np.asarray(jax.device_get(stacked))
        return sorted(zip(times, host), key=lambda tf: tf[0])

    def push(self, key_frames: np.ndarray) -> list[tuple[int, jax.Array]]:
        """Feed one blurry key frame per stream: (B, H, W, 3), float in
        [0, 1] or uint8 (normalized on device).

        Returns a list of (global_output_time, (B, H, W, 3) sharp frame) of
        DEVICE-RESIDENT unpacked jax arrays, empty until the first window
        fills — except in ``buffer_drain`` mode, where push() always
        returns [] and emissions accumulate on device for ``drain()``
        (keeps serving at ONE device dispatch per key).
        """
        if key_frames.shape != (self.batch, self.height, self.width, 3):
            raise ValueError(f"expected {(self.batch, self.height, self.width, 3)},"
                             f" got {key_frames.shape}")
        if self._plan is not None:
            # commit the host frame with the stream sharding up front so the
            # jitted step runs SPMD instead of pulling everything to device 0
            key_frames = self._shard(key_frames)
        self._keys_seen += 1
        if self._keys_seen < self.k:
            self._stack = self._insert(key_frames, self._stack)
            return []

        first = self._keys_seen == self.k
        emitted, self._stack, self.states, outputs = self._step_emit(
            self.params, key_frames, self._stack, self.states, first)
        window_start_t = 2 * (self._keys_seen - self.k)
        self._last_outputs, self._last_start_t = outputs, window_start_t
        times = [window_start_t + t for _, _, t in self._plans[first]]
        if self.async_drain:
            self._fetch_q.put((times, emitted))  # already finalized in-step
            return []
        if self.buffer_drain:
            self._pending.append((times, emitted))
            return []
        return [(t, self.model.unpack(emitted[i]))
                for i, t in enumerate(times)]

    def flush(self) -> list[tuple[int, jax.Array]]:
        """End of stream: emit the trailing times (local K..2K-3) of the
        last computed window, which steady-state deferred to future windows
        that will never arrive.  Device-resident like push()."""
        if self._last_outputs is None:
            return []
        levels = self.model.num_levels_total
        times_by_level = {li: level_output_times(li + 1, self.k)
                          for li in range(levels)}
        plan = []
        for t in range(self.k, 2 * (self.k - 1)):
            for li in range(levels - 1, -1, -1):
                if t in times_by_level[li]:
                    plan.append((li, times_by_level[li].index(t), t))
                    break
        times = [self._last_start_t + t for _, _, t in plan]
        frames = [self._last_outputs[li][:, j] for li, j, _ in plan]
        self._last_outputs = None
        if self.async_drain:
            # once per stream end: finalize + enqueue for background fetch
            self._fetch_q.put((times, self._finalize_jit(jnp.stack(frames))))
            return []
        if self.buffer_drain:
            self._pending.append((times, jnp.stack(frames)))
            return []
        return [(t, self.model.unpack(f)) for t, f in zip(times, frames)]
