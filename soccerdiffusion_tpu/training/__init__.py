"""Training engines: end-to-end diffusion training and sampler distillation."""

from soccerdiffusion_tpu.training.trainer import (
    TrainState,
    create_train_state,
    make_optimizer,
    make_train_step,
)
from soccerdiffusion_tpu.training.checkpoint import load_checkpoint, save_checkpoint

__all__ = [
    "TrainState",
    "create_train_state",
    "make_optimizer",
    "make_train_step",
    "save_checkpoint",
    "load_checkpoint",
]
