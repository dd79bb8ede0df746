"""720p input pack (space-to-depth) as a Pallas VMEM relayout kernel.

Why this exists (BASELINE.md round-3 non-conv attribution): XLA lowers the
reshape→transpose→reshape form of the stem pack to HBM layout copies it
executes at ~20 GB/s (trace r3: copy.461/462, 2.3 ms per 720p window) —
the transpose's innermost dimension is the 3-wide RGB axis, pathological
for the (8,128) vector tile. The committed analysis concluded the copies
are "not reachable from JAX short of hand-writing a Pallas kernel per
handoff"; this is that kernel for the biggest handoff, the input pack.

Shape algebra (factor f, channels C): viewing each image as rows of
W*C contiguous elements, output row yo interleaves the f input rows
yo*f+dy at (f*C)-element granularity:

    out[yo].reshape(Wo, f, f*C)[x, dy, :] = in[yo*f + dy].reshape(Wo, f*C)[x, :]

so one kernel block = T output rows: read (T*f, W*C) from HBM once,
permute in VMEM, write (T, Wo*f*f*C) once — data moves through the VPU
shuffle network instead of strided HBM copies. Bit-exact: a pure
permutation, no arithmetic at any dtype.

Verdict (round 4, BASELINE.md): Mosaic cannot compile this kernel on the
target backend (runs/bench_r4_s2dpallas.json.failed), so the config
surface (``model.s2d_pallas``) was removed with the round-5 flag
graveyard — the kernel stays as the recorded engineering with its
interpret-mode unit tests (bit-exactness, custom-VJP gradients).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["space_to_depth_pallas"]


def _pack_kernel(in_ref, out_ref, *, t: int, f: int, wo: int, fc: int):
    x = in_ref[:]                      # (T*f, W*C)
    x = x.reshape(t, f, wo, fc)        # split rows into (dy, x-cell) grid
    x = jnp.swapaxes(x, 1, 2)          # (T, Wo, f, f*C): dy becomes channel-major
    out_ref[:] = x.reshape(t, wo * f * fc)


def _rows_tile(ho: int, max_tile: int = 16) -> int:
    """Largest divisor of ho that is <= max_tile (blocks must not straddle
    image boundaries, so the tile must divide the per-image output rows)."""
    for t in range(min(max_tile, ho), 0, -1):
        if ho % t == 0:
            return t
    return 1


def _forward(x: jax.Array, factor: int, interpret: bool) -> jax.Array:
    *lead, h, w, c = x.shape
    f = factor
    ho, wo = h // f, w // f
    n = 1
    for d in lead:
        n *= d
    fc = f * c
    rows_in = x.reshape(n * h, w * c)

    t = _rows_tile(ho)
    grid = (n, ho // t)
    out = pl.pallas_call(
        functools.partial(_pack_kernel, t=t, f=f, wo=wo, fc=fc),
        grid=grid,
        in_specs=[pl.BlockSpec((t * f, w * c),
                               lambda i, j: (i * ho // t + j, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((t, wo * f * fc),
                               lambda i, j: (i * ho // t + j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n * ho, wo * f * fc), x.dtype),
        interpret=interpret,
    )(rows_in)
    return out.reshape(*lead, ho, wo, f * f * c)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def space_to_depth_pallas(x: jax.Array, factor: int,
                          interpret: bool | None = None) -> jax.Array:
    """(..., H, W, C) → (..., H/f, W/f, C*f*f); bit-exact permutation with
    the same channel layout as ``pixel_shuffle.space_to_depth`` (output
    channel (dy*f + dx)*C + c).

    ``interpret=None`` auto-selects: compiled on TPU (incl. the axon
    tunnel), interpreter elsewhere (CPU tests).
    """
    if factor == 1:
        return x
    *_, h, w, _ = x.shape
    if h % factor or w % factor:
        raise ValueError(f"spatial dims {(h, w)} not divisible by {factor}")
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    return _forward(x, factor, interpret)


def _fwd(x, factor, interpret):
    return space_to_depth_pallas(x, factor, interpret), None


def _bwd(factor, interpret, _res, g):
    # exact inverse permutation; cotangent flows through unchanged
    from bin_tpu.ops.pixel_shuffle import depth_to_space
    return (depth_to_space(g, factor),)


space_to_depth_pallas.defvjp(_fwd, _bwd)
