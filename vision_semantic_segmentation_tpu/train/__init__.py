from .build import build_dataloader, build_transform
from .checkpoint import Checkpoint
from .freezer import bn_mask, freeze_mask, mask_frozen
from .meters import AverageMeter, GenericMetric, MeterLogger
from .optim import (
    build_optimizer,
    build_schedule,
    multi_step_lr,
    polynomial_lr_decay,
    step_lr,
)
from .trainer import Trainer, train

__all__ = [
    "build_dataloader",
    "build_transform",
    "Checkpoint",
    "bn_mask",
    "freeze_mask",
    "mask_frozen",
    "AverageMeter",
    "GenericMetric",
    "MeterLogger",
    "build_optimizer",
    "build_schedule",
    "multi_step_lr",
    "polynomial_lr_decay",
    "step_lr",
    "Trainer",
    "train",
]
