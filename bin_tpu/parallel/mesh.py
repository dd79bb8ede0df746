"""Device mesh construction and sharding rules.

Sharding layout for training (data-parallel, the reference-parity mode):
  params / opt state : replicated
  batch arrays       : sharded over ('data',) on the leading batch dim
  ConvLSTM carries   : sharded like the batch (leading dim is batch)

The optional 'spatial' axis shards the H dimension of activations for
very large frames; with it, batch dim maps to 'data' and the H dim of
frames to 'spatial'.  All collectives are emitted by XLA from these
NamedShardings — no hand-written comm layer (SURVEY.md §6.8).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from bin_tpu.config import ParallelConfig

__all__ = ["MeshPlan", "make_mesh", "batch_sharding", "replicated", "shard_batch"]


@dataclasses.dataclass(frozen=True)
class MeshPlan:
    """A mesh plus the sharding rules derived from it."""

    mesh: Mesh
    data_axis: str = "data"
    spatial_axis: str = "spatial"

    @property
    def num_data(self) -> int:
        return self.mesh.shape[self.data_axis]

    @property
    def num_spatial(self) -> int:
        return self.mesh.shape[self.spatial_axis]

    def replicated(self) -> NamedSharding:
        return NamedSharding(self.mesh, P())

    def batch(self, ndim: int, batch_dim: int = 0,
              height_dim: int | None = None) -> NamedSharding:
        """Sharding for an activation: batch over 'data', optionally H over
        'spatial'."""
        spec: list[Any] = [None] * ndim
        spec[batch_dim] = self.data_axis
        if height_dim is not None and self.num_spatial > 1:
            spec[height_dim] = self.spatial_axis
        return NamedSharding(self.mesh, P(*spec))

    def activation(self, x: Any) -> NamedSharding:
        """Sharding for a concrete NHWC-like array: batch (dim 0) over
        'data'; frame height (dim 1 of 4-D frames/carries, dim 2 of 5-D
        frame stacks) over 'spatial' ONLY when it divides evenly.

        The divisibility condition is load-bearing, not cosmetic: deep
        ConvLSTM carries sit at the bottleneck resolution
        (height / (stem_factor · 2^(levels-1))) which often does NOT divide
        the spatial axis even when the input height does — device_put of a
        global array requires even splits, so those arrays must stay
        replicated along 'spatial' while the big frame stacks shard.
        The ONE place this layout rule lives; streaming and eval both use it.
        """
        shape = np.shape(x)
        hd = {4: 1, 5: 2}.get(len(shape))
        if hd is not None and (self.num_spatial <= 1
                               or shape[hd] % self.num_spatial):
            hd = None
        return self.batch(len(shape), height_dim=hd)


def make_mesh(cfg: ParallelConfig | None = None,
              devices: list | None = None) -> MeshPlan:
    cfg = cfg or ParallelConfig()
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    data = cfg.data_axis_size
    spatial = max(1, cfg.spatial_axis_size)
    if data == -1:
        data = n // spatial
    if data * spatial > n:
        raise ValueError(
            f"mesh {data}x{spatial} needs {data * spatial} devices, have {n}")
    dev_array = np.asarray(devices[: data * spatial]).reshape(data, spatial)
    mesh = Mesh(dev_array, cfg.axis_names)
    return MeshPlan(mesh=mesh, data_axis=cfg.axis_names[0],
                    spatial_axis=cfg.axis_names[1])


def _spans_processes(plan: MeshPlan) -> bool:
    """True when the mesh contains devices this process cannot address —
    the multi-host case, where plain device_put of host data cannot build
    the global array and jax.make_array_from_process_local_data must."""
    return any(d.process_index != jax.process_index()
               for d in plan.mesh.devices.flat)


def replicated(plan: MeshPlan, tree: Any) -> Any:
    """Put a pytree fully replicated over the mesh.

    Multi-host: every process must hold identical host values (deterministic
    init from the same seed, or a broadcast checkpoint restore) — each
    contributes its addressable replicas of the global array.
    """
    sharding = plan.replicated()
    if _spans_processes(plan):
        return jax.tree.map(
            lambda x: jax.make_array_from_process_local_data(
                sharding, np.asarray(x)), tree)
    return jax.device_put(tree, sharding)


def batch_sharding(plan: MeshPlan, ndim: int) -> NamedSharding:
    return plan.batch(ndim)


def shard_batch(plan: MeshPlan, batch: Any) -> Any:
    """Put a host batch pytree with the leading dim sharded over 'data'
    (the host→device boundary of the input pipeline).

    Multi-host: ``batch`` is this process's LOCAL slice (global batch /
    process_count rows, in process_index order — see
    bin_tpu.parallel.distributed.process_batch_slice); the global array is
    assembled across processes without any cross-host data movement.
    """
    if _spans_processes(plan):
        return jax.tree.map(
            lambda x: jax.make_array_from_process_local_data(
                plan.batch(np.ndim(x)), np.asarray(x)), batch)
    return jax.tree.map(
        lambda x: jax.device_put(x, plan.batch(np.ndim(x))), batch)
