"""Multi-host (multi-process) initialization.

The single-host mesh code in bin_tpu.parallel.mesh extends to multi-host
SPMD unchanged: once ``jax.distributed.initialize`` has run on every host,
``jax.devices()`` spans all hosts, the same ``Mesh`` construction lays the
``data`` axis across hosts (gradient all-reduce rides ICI within a slice and
DCN across slices), and input pipelines shard by process
(bin_tpu.data.grain_pipeline ``shard_by_process=True``).

The reference has no multi-node story at all (single-process DataParallel,
SURVEY.md §6.8) — this module is the TPU-native upgrade path.
"""

from __future__ import annotations

import os

import jax

__all__ = ["maybe_initialize", "is_multi_host", "process_batch_slice"]


def maybe_initialize(coordinator_address: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None) -> bool:
    """Initialize jax.distributed when running under a multi-host launcher.

    No-ops (returns False) in single-process runs so every entry point can
    call it unconditionally.  On TPU pods the arguments are auto-detected
    from the environment; they can be forced for other launchers.
    """
    # IMPORTANT: decide and initialize BEFORE any call that touches the XLA
    # backend (jax.process_count()/jax.devices() would initialize it and
    # make jax.distributed.initialize fail on a real multi-host launch).
    from jax._src import distributed as _dist_state
    if getattr(_dist_state.global_state, "client", None) is not None:
        return True  # already initialized

    explicit = coordinator_address is not None
    # NOTE: only explicit coordinator env vars trigger auto-init; single-host
    # TPU tunnels also export TPU_* variables, so those are not a signal.
    launcher = any(v in os.environ for v in
                   ("COORDINATOR_ADDRESS", "MEGASCALE_COORDINATOR_ADDRESS"))
    if not (explicit or launcher):
        return False
    try:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)
    except RuntimeError as exc:
        # backend already initialized (interactive/test session): stay
        # single-process rather than crash the entry point
        import warnings
        warnings.warn(f"jax.distributed.initialize skipped: {exc}")
        return False
    return True


def is_multi_host() -> bool:
    return jax.process_count() > 1


def process_batch_slice(global_batch: int) -> tuple[int, int]:
    """(per-process batch, start offset) for an evenly host-sharded batch."""
    n = jax.process_count()
    if global_batch % n:
        raise ValueError(f"global batch {global_batch} not divisible by "
                         f"{n} processes")
    per = global_batch // n
    return per, per * jax.process_index()
