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


def replicated(plan: MeshPlan, tree: Any) -> Any:
    """Device-put a pytree fully replicated over the mesh."""
    return jax.device_put(tree, plan.replicated())


def batch_sharding(plan: MeshPlan, ndim: int) -> NamedSharding:
    return plan.batch(ndim)


def shard_batch(plan: MeshPlan, batch: Any) -> Any:
    """Device-put a host batch pytree with the leading dim sharded over
    'data' (the host→device boundary of the input pipeline)."""
    return jax.tree.map(
        lambda x: jax.device_put(x, plan.batch(np.ndim(x))), batch)
