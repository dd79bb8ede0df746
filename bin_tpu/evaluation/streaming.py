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

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from bin_tpu.models.pyramid import level_output_times
from bin_tpu.registry import Model

__all__ = ["StreamingSession"]


class StreamingSession:
    """Streaming joint deblur + 2x interp with DEVICE-RESIDENT emissions.

    ``push`` returns (time, frame) pairs whose frames are unpacked jax
    arrays still on device — dispatch is async, so push() itself does not
    wait for the step.  Fetch to host happens either lazily (the caller
    materializes a frame) or in one batched transfer via ``drain()`` —
    on a tunneled device, one stacked fetch of N frames costs one round
    trip instead of N (VERDICT r1 item 9)."""

    def __init__(self, model: Model, params: Any, batch: int, height: int,
                 width: int, buffer_drain: bool = False):
        """``buffer_drain``: additionally retain emissions on device for
        batched fetch via drain() (off by default so a consumer that
        materializes push() results directly keeps memory O(window))."""
        self.model = model
        self.params = params
        self.k = model.cfg.window_size
        self.batch, self.height, self.width = batch, height, width
        self.buffer_drain = buffer_drain
        self._step = jax.jit(
            lambda p, w, s: model.apply_window(p, w, s, producer_clamp=True))
        self.reset()

    def reset(self) -> None:
        """New stream(s): clear ConvLSTM carries and the frame window."""
        self.states = self.model.initial_state(self.batch, self.height,
                                               self.width)
        self._window: list[jax.Array] = []
        self._keys_seen = 0
        self._last_outputs = None
        self._last_start_t = 0
        self._pending: list[tuple[int, jax.Array]] = []  # packed, on device

    def drain(self) -> list[tuple[int, np.ndarray]]:
        """Fetch every pending emission in ONE stacked device→host transfer
        and return (time, (B, H, W, 3) fp32 numpy) pairs in time order."""
        if not self._pending:
            return []
        times = [t for t, _ in self._pending]
        stacked = self.model.unpack(jnp.stack([f for _, f in self._pending]))
        self._pending = []
        host = np.asarray(jax.device_get(stacked))
        return sorted(zip(times, host), key=lambda tf: tf[0])

    def _emit_plan(self, first_window: bool) -> list[tuple[int, int, int]]:
        """(level_idx, pair_idx, local_time) to emit for this window.

        Steady state emits local times {K-2, K-1} — one deblurred key + one
        midpoint per arriving key (exactly 2x rate), each from the DEEPEST
        level predicting that parity and from the latest window containing
        it (max ConvLSTM history; consistent with recurrent.assembly_plan).
        Consecutive windows advance by 2 on the output grid, so emissions
        are contiguous and in order; the first full window back-fills times
        1..K-3.  Latency: 2 key intervals behind the newest input.
        """
        levels = self.model.num_levels_total
        times_by_level = {li: level_output_times(li + 1, self.k)
                          for li in range(levels)}

        def deepest(t):
            for li in range(levels - 1, -1, -1):
                if t in times_by_level[li]:
                    return (li, times_by_level[li].index(t), t)
            return None  # e.g. even times in an interp-only 1-level model

        plan = [deepest(t) for t in range(1, self.k - 2)] if first_window else []
        plan += [deepest(self.k - 2), deepest(self.k - 1)]
        return [p for p in plan if p is not None]

    def push(self, key_frames: np.ndarray) -> list[tuple[int, jax.Array]]:
        """Feed one blurry key frame per stream: (B, H, W, 3).

        Returns a list of (global_output_time, (B, H, W, 3) sharp frame),
        empty until the first window fills.  Frames are DEVICE-RESIDENT
        unpacked fp32 jax arrays (async dispatch — not yet computed when
        returned); materialize per frame, or buffer and call ``drain()``
        for one batched fetch.
        """
        if key_frames.shape != (self.batch, self.height, self.width, 3):
            raise ValueError(f"expected {(self.batch, self.height, self.width, 3)},"
                             f" got {key_frames.shape}")
        from bin_tpu.ops.pixel_shuffle import space_to_depth
        # pack on arrival (cast-then-pack: bf16 transposes are ~10x cheaper);
        # the window buffer and the pyramid stay in packed domain; frames
        # unpack only on emission (see models/backbone.py)
        packed = space_to_depth(
            jnp.asarray(key_frames).astype(jnp.dtype(self.model.cfg.dtype)),
            self.model.cfg.stem_factor)
        self._window.append(packed)
        self._keys_seen += 1
        if len(self._window) > self.k:
            self._window.pop(0)
        if len(self._window) < self.k:
            return []

        window = jnp.stack(self._window, axis=1)
        outputs, self.states = self._step(self.params, window, self.states)
        first = self._keys_seen == self.k
        window_start_t = 2 * (self._keys_seen - self.k)
        self._last_outputs, self._last_start_t = outputs, window_start_t
        emitted = [(window_start_t + t, outputs[li][:, j])
                   for li, j, t in self._emit_plan(first)]
        if self.buffer_drain:
            self._pending.extend(emitted)
        return [(t, self.model.unpack(f)) for t, f in emitted]

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
        emitted = [(self._last_start_t + t, self._last_outputs[li][:, j])
                   for li, j, t in plan]
        if self.buffer_drain:
            self._pending.extend(emitted)
        self._last_outputs = None
        return [(t, self.model.unpack(f)) for t, f in emitted]
