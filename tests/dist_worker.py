"""Subprocess worker for the REAL 2-process jax.distributed test
(tests/test_distributed.py).

Each worker process owns 2 fake CPU devices; jax.distributed.initialize
joins them into one 4-device global mesh (collectives cross the process
boundary via Gloo — the CPU stand-in for the DCN path of SURVEY.md §6.8).
The worker runs one data-parallel train step of a tiny PRF model on its
process-local batch slice and writes loss + a param digest for the parent
to compare across ranks and against the single-process step.
"""

from __future__ import annotations

import dataclasses
import hashlib
import json
import os
import sys

# `python tests/dist_worker.py` puts tests/ (not the repo root) on sys.path,
# so a checkout without an editable install couldn't import bin_tpu.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def tiny_cfg():
    from bin_tpu.config import get_config
    cfg = get_config("config3_prf")
    return dataclasses.replace(
        cfg,
        model=dataclasses.replace(cfg.model, base_features=8,
                                  num_res_blocks=1, convlstm_features=16),
        data=dataclasses.replace(cfg.data, crop_size=(32, 32), batch_size=8,
                                 seq_len=4),
    )


def global_batch(cfg):
    """The full global batch, generated identically on every process."""
    from bin_tpu.data.pipeline import SyntheticSource, train_iterator
    src = SyntheticSource(4, 4, 48, 48, seed=0)
    return next(train_iterator(src, cfg.data.batch_size, cfg.data.crop_size,
                               seed=1, random_flip=False))


def _local(x):
    """Host value of this process's replica of a (replicated) global array."""
    import numpy as np
    if hasattr(x, "addressable_data"):
        return np.asarray(x.addressable_data(0))
    return np.asarray(x)


def main_train(port: str, pid: int, workdir: str) -> None:
    """Mode 2: the PUBLIC train() entry end-to-end under 2 processes —
    shared workdir, global batch sliced per process, orbax multi-process
    save, process-0-only logging."""
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    import jax
    jax.config.update("jax_platforms", "cpu")
    from bin_tpu.parallel.distributed import maybe_initialize
    assert maybe_initialize(f"localhost:{port}", 2, pid)

    from bin_tpu.config import ParallelConfig
    from bin_tpu.training.trainer import train
    cfg = tiny_cfg()
    cfg = dataclasses.replace(
        cfg,
        parallel=ParallelConfig(data_axis_size=-1),
        checkpoint=dataclasses.replace(cfg.checkpoint, save_interval_steps=4,
                                       keep_last_n=1),
        log=dataclasses.replace(cfg.log, log_interval_steps=1),
    )
    state = train(cfg, workdir=workdir, num_steps=4)
    assert int(jax.device_get(state.step)) == 4


def main(port: str, pid: int, out_path: str) -> None:
    # 2 local devices per process; MUST be set before importing jax
    # (shell-level env vars are ignored on this host — tests/conftest.py).
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_matmul_precision", "highest")

    from bin_tpu.parallel.distributed import (is_multi_host, maybe_initialize,
                                              process_batch_slice)
    assert maybe_initialize(f"localhost:{port}", 2, pid)
    assert is_multi_host()
    assert jax.process_count() == 2 and len(jax.devices()) == 4

    import numpy as np

    from bin_tpu.config import ParallelConfig
    from bin_tpu.parallel.mesh import make_mesh, replicated, shard_batch
    from bin_tpu.registry import build_model
    from bin_tpu.training.state import create_train_state
    from bin_tpu.training.trainer import make_train_step

    cfg = tiny_cfg()
    model = build_model(cfg)
    # Deterministic init from a shared seed -> identical params on each host
    state = create_train_state(cfg, model, jax.random.key(0))
    per, off = process_batch_slice(cfg.data.batch_size)
    local = {k: v[off:off + per] for k, v in global_batch(cfg).items()}

    plan = make_mesh(ParallelConfig(data_axis_size=-1))
    assert plan.num_data == 4
    step = make_train_step(model, cfg, plan)
    new_state, aux = step(replicated(plan, state), shard_batch(plan, local))

    digest = hashlib.sha256()
    for leaf in jax.tree.leaves(new_state.params):
        digest.update(_local(leaf).tobytes())
    with open(out_path, "w") as f:
        json.dump({"pid": pid,
                   "loss_total": float(_local(aux["loss_total"])),
                   "param_digest": digest.hexdigest()}, f)


if __name__ == "__main__":
    if len(sys.argv) > 4 and sys.argv[4] == "train":
        main_train(sys.argv[1], int(sys.argv[2]), sys.argv[3])
    else:
        main(sys.argv[1], int(sys.argv[2]), sys.argv[3])
