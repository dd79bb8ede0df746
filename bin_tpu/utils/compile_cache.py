"""Persistent XLA compilation cache setup.

Compiles through this environment's remote-compile tunnel cost 12-32
MINUTES per program (docs/DESIGN.md §4d) — but the standard JAX persistent
cache turns out to work fine with the axon PJRT backend (verified round 3:
repeated programs deserialize in seconds). Every long-lived entry point
(bench, train CLI, graft entry) enables it so identical programs never
recompile across processes or rounds.
"""

from __future__ import annotations

import os

__all__ = ["enable_persistent_cache"]

_DEFAULT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), ".jax_cache")


def enable_persistent_cache(path: str | None = None) -> str:
    """Point jax at a persistent compilation cache dir (idempotent).

    Precedence: explicit arg > JAX_COMPILATION_CACHE_DIR env > .jax_cache
    next to the repo root. Safe to call before or after jax is imported
    (the cache dir is read at compile time, not import time)."""
    import jax

    path = (path or os.environ.get("JAX_COMPILATION_CACHE_DIR") or _DEFAULT)
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    # cache everything: the default min-compile-time threshold would skip
    # small-but-tunnel-slow programs
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    return path
