"""Orbax checkpointing (reference: torch.save(state_dict) per epoch + --resume,
SURVEY.md §6.4).

Saves the full TrainState (params + optax state + step) with keep-latest-k
retention and async writes (preemption-safe on v5e — SURVEY.md §6.3);
``restore_if_available`` auto-resumes from the newest valid step.  ConvLSTM
eval carries are deliberately NOT checkpointed — they reset per video,
matching reference semantics.
"""

from __future__ import annotations

import os
from typing import Any

import jax
import orbax.checkpoint as ocp

from bin_tpu.config import CheckpointConfig
from bin_tpu.training.state import TrainState

__all__ = ["make_manager", "save", "restore_if_available", "restore_params"]


def make_manager(directory: str, cfg: CheckpointConfig | None = None
                 ) -> ocp.CheckpointManager:
    cfg = cfg or CheckpointConfig()
    options = ocp.CheckpointManagerOptions(
        max_to_keep=cfg.keep_last_n,
        enable_async_checkpointing=cfg.async_save,
    )
    return ocp.CheckpointManager(os.path.abspath(directory), options=options)


def save(manager: ocp.CheckpointManager, step: int, state: TrainState) -> None:
    manager.save(step, args=ocp.args.StandardSave(state))


def restore_if_available(manager: ocp.CheckpointManager,
                         state: TrainState) -> TrainState:
    """Restore the latest checkpoint if one exists, else return ``state``.

    The abstract target is built from ``state`` so restored arrays adopt its
    shardings (replicated-over-mesh states restore replicated).
    """
    latest = manager.latest_step()
    if latest is None:
        return state
    abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct, state)
    return manager.restore(latest, args=ocp.args.StandardRestore(abstract))


def restore_params(directory: str, ema: bool = False) -> Any:
    """Load only the params pytree from the newest checkpoint in a dir
    (eval/demo path: no optimizer state needed).  Restores the raw saved
    tree and extracts ``params`` so callers need no optimizer knowledge.
    ``ema=True`` returns the EMA shadow params instead (runs trained with
    ``optim.ema_decay > 0``); raises if the checkpoint carries none.

    Also accepts a released-weights ``.npz`` (bin-tpu-export) so every
    params consumer — eval --checkpoint, train --init-from — can start
    from a released file, the reference's load-pretrained flow
    (SURVEY.md §3.2 'Model factory')."""
    if directory.endswith(".npz"):
        if ema:
            raise ValueError("released .npz weights carry a single params "
                             "tree; export with --ema instead")
        from bin_tpu.weights import load_weights
        params, _, _ = load_weights(directory)
        return params
    manager = make_manager(directory)
    latest = manager.latest_step()
    if latest is None:
        raise FileNotFoundError(f"no checkpoint found under {directory}")
    restored = manager.restore(latest)
    key = "ema_params" if ema else "params"
    got = (restored.get(key) if isinstance(restored, dict)
           else getattr(restored, key, None))
    if got is None:
        if ema:
            raise ValueError(
                f"checkpoint under {directory} has no EMA params "
                "(trained with optim.ema_decay=0?)")
        raise ValueError(f"checkpoint under {directory} has no params tree")
    return got
