"""Training: optimizer/train-state, jitted SPMD train step, Orbax checkpoints."""

from bin_tpu.training.state import TrainState, make_optimizer, create_train_state
from bin_tpu.training.trainer import make_train_step, train

__all__ = ["TrainState", "make_optimizer", "create_train_state",
           "make_train_step", "train"]
