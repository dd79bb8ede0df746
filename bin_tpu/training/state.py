"""Train state + optimizer (reference recipe: Adam lr~1e-4 with step decay,
SURVEY.md §4.1 [R][P]); optax equivalents with global-norm clipping."""

from __future__ import annotations

from typing import Any

import flax.struct
import jax
import optax

from bin_tpu.config import Config, OptimConfig
from bin_tpu.registry import Model

__all__ = ["TrainState", "make_lr_schedule", "make_optimizer",
           "create_train_state"]


@flax.struct.dataclass
class TrainState:
    step: jax.Array
    params: Any
    opt_state: Any
    # EMA of params (optim.ema_decay > 0), else None (an empty pytree — old
    # checkpoints without the field restore unchanged when EMA is off).
    ema_params: Any = None


def make_lr_schedule(cfg: OptimConfig) -> optax.Schedule:
    schedule = optax.exponential_decay(
        init_value=cfg.learning_rate,
        transition_steps=cfg.lr_decay_steps,
        decay_rate=cfg.lr_decay_rate,
        staircase=True,  # step decay, as the reference's scheduler
    )
    if cfg.lr_warmup_steps > 0:
        schedule = optax.join_schedules(
            [optax.linear_schedule(0.0, cfg.learning_rate,
                                   cfg.lr_warmup_steps),
             schedule], [cfg.lr_warmup_steps])
    return schedule


def make_optimizer(cfg: OptimConfig) -> optax.GradientTransformation:
    schedule = make_lr_schedule(cfg)
    chain = []
    if cfg.grad_clip_norm > 0:
        chain.append(optax.clip_by_global_norm(cfg.grad_clip_norm))
    if cfg.weight_decay > 0:
        chain.append(optax.adamw(schedule, b1=cfg.beta1, b2=cfg.beta2,
                                 weight_decay=cfg.weight_decay))
    else:
        chain.append(optax.adam(schedule, b1=cfg.beta1, b2=cfg.beta2))
    tx = optax.chain(*chain)
    if cfg.skip_nonfinite:
        # a NaN/Inf gradient step is dropped (params and Adam moments
        # untouched) instead of corrupting the run; give up only after many
        # consecutive failures so a genuinely broken run still crashes
        tx = optax.apply_if_finite(tx, max_consecutive_errors=100)
    return tx


def create_train_state(cfg: Config, model: Model, rng: jax.Array,
                       sample_hw: tuple[int, int] | None = None) -> TrainState:
    h, w = sample_hw or cfg.data.crop_size
    params = model.init(rng, batch=1, height=h, width=w)
    optimizer = make_optimizer(cfg.optim)
    import jax.numpy as jnp
    # EMA initialized AT the params (no bias correction needed later).
    # jnp.copy, not identity: aliased leaves would be donated twice by the
    # donated train step (XLA rejects `f(donate(a), donate(a))`).
    ema = (jax.tree.map(jnp.copy, params)
           if cfg.optim.ema_decay > 0 else None)
    return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                      opt_state=optimizer.init(params), ema_params=ema)
