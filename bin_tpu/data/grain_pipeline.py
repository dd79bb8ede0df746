"""Grain-based input pipeline (deterministic, checkpointable loader).

The default pipeline (bin_tpu.data.pipeline) is a lean prefetch thread —
right for this 1-CPU-core build host.  This module provides the same batch
contract through Grain's DataLoader for deployments that want Grain's
determinism guarantees, worker processes, sharding by JAX process, and
loader checkpointing (SURVEY.md §2 L3, §6.2):

  * any bin_tpu source (SyntheticSource / FrameFolderSource) is wrapped as a
    grain RandomAccessDataSource
  * crop/flip is a grain RandomMapTransform keyed by grain's per-record RNG
    → identical batches for identical (seed, step), resumable mid-epoch
  * multi-host sharding uses ShardByJaxProcess so each host reads a disjoint
    shard (the DCN analog of the batch sharding in bin_tpu.parallel)
"""

from __future__ import annotations

from typing import Any, Iterator

import numpy as np

__all__ = ["grain_train_iterator"]


def grain_train_iterator(source, batch_size: int, crop_size: tuple[int, int],
                         seed: int = 0, random_flip: bool = True,
                         num_workers: int = 0, num_epochs: int | None = None,
                         shard_by_process: bool = False,
                         keep_u8: bool = False,
                         shard_index: int | None = None,
                         shard_count: int | None = None,
                         ) -> Iterator[dict[str, np.ndarray]]:
    """Grain DataLoader yielding the standard batch dict.

    num_workers=0 keeps everything in-process (single-core host default);
    raise it on multi-core production hosts.

    Sharding (multi-host input, SURVEY.md §6.8): ``shard_by_process=True``
    shards records by JAX process (each host reads a disjoint shard);
    explicit ``shard_index``/``shard_count`` override it — the same
    mechanism with the shard picked by the caller (testable in one process,
    usable from non-JAX launchers).
    """
    import grain.python as gp

    from bin_tpu.data.pipeline import _random_crop_flip

    class _Source(gp.RandomAccessDataSource):
        def __len__(self):
            return len(source)

        def __getitem__(self, i):
            return source[int(i)]

        def __repr__(self):
            # grain validates checkpoints against repr(data_source): must be
            # stable across processes (default repr embeds the object id)
            return (f"bin_tpu._Source({type(source).__name__}, "
                    f"len={len(source)})")

    class _CropFlip(gp.RandomMapTransform):
        def random_map(self, sample, rng: np.random.Generator):
            return _random_crop_flip(sample, crop_size, rng, random_flip,
                                     keep_u8=keep_u8)

    if shard_count is not None:
        sharding = gp.ShardOptions(shard_index=shard_index or 0,
                                   shard_count=shard_count,
                                   drop_remainder=True)
    elif shard_by_process:
        sharding = gp.ShardByJaxProcess(drop_remainder=True)
    else:
        sharding = gp.NoSharding()
    sampler = gp.IndexSampler(
        num_records=len(source),
        shard_options=sharding,
        shuffle=True,
        num_epochs=num_epochs,
        seed=seed,
    )
    loader = gp.DataLoader(
        data_source=_Source(),
        sampler=sampler,
        operations=[_CropFlip(), gp.Batch(batch_size, drop_remainder=True)],
        worker_count=num_workers,
    )
    return iter(loader)
