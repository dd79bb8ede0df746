"""Device→host transfer-path warmup for tunneled TPU runtimes.

On this environment's experimental `axon` PJRT tunnel, the FIRST bulk
device→host transfer of a process is catastrophically slow and every
subsequent one is normal — measured 208 s then 0.32 s for the same ~11 MB
fetch of a bare ``x*2+1`` result (no model, no big program; round-4 probe).
Scalar fetches are unaffected, which is why training/bench slope timing
never saw it; anything that fetches FRAMES (serving, demo, per-video eval)
eats the cliff at its first synchronizing fetch.  The round-4 HTTP serving
bench chased this for three runs as a "~300 s stall at key 13" before the
server-side phase split + a bare-transfer probe isolated it
(BASELINE.md round-4 HTTP section).

``warm_d2h()`` fronts that cost at process/daemon startup — one dummy
transfer, idempotent, a no-op wherever the D2H path needs no warmup (CPU:
milliseconds).
"""

from __future__ import annotations

__all__ = ["warm_d2h"]

_warmed = False


def warm_d2h(nbytes: int = 8 << 20) -> float:
    """Run one throwaway device→host transfer of ``nbytes`` so later
    fetches run at steady-state speed.  Returns the seconds it took
    (useful to log at daemon boot).  Idempotent per process."""
    global _warmed
    import time

    import jax
    import jax.numpy as jnp
    import numpy as np

    if _warmed:
        return 0.0
    t0 = time.monotonic()
    n = max(1, nbytes // 4)
    x = jnp.ones((n,), jnp.float32) * 2.0 + 1.0  # force a real computation
    np.asarray(jax.device_get(x))
    _warmed = True
    return time.monotonic() - t0
