from .losses import LossConfig, compute_loss
from .optim import (
    CosineAnnealingLR,
    ReduceLROnPlateau,
    lr_decay,
    make_adam,
    make_optimizer,
    make_scheduler,
)
from .init import torch_match_init
from .step import (
    TrainState,
    make_eval_loss_step,
    make_multi_train_step,
    make_train_step,
)

__all__ = [
    "torch_match_init",
    "LossConfig",
    "compute_loss",
    "CosineAnnealingLR",
    "ReduceLROnPlateau",
    "lr_decay",
    "make_adam",
    "make_optimizer",
    "make_scheduler",
    "TrainState",
    "make_eval_loss_step",
    "make_train_step",
    "make_multi_train_step",
]
