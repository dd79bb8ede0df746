"""SPMD parallelism over a TPU device mesh (SURVEY.md §6.8).

The reference's only distribution mechanism is single-process
``nn.DataParallel`` replication with GPU-0 gather bottlenecks; the
TPU-native design replaces it wholesale with a ``jax.sharding.Mesh``:
batch sharded over the ``data`` axis (gradient all-reduce rides ICI),
parameters replicated, and optionally activation-height sharding over a
``spatial`` axis for 720p+ convolutions (XLA inserts halo exchanges).
"""

from bin_tpu.parallel.mesh import (
    make_mesh, batch_sharding, replicated, shard_batch, MeshPlan,
)
from bin_tpu.parallel.distributed import (
    maybe_initialize, is_multi_host, process_batch_slice,
)

__all__ = ["make_mesh", "batch_sharding", "replicated", "shard_batch",
           "MeshPlan", "maybe_initialize", "is_multi_host",
           "process_batch_slice"]
