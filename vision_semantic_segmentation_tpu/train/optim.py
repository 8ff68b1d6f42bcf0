"""Optimizer + LR schedule builders on optax.

Rebuild of `/root/reference/src/network/core/optim/build.py:15-66` and
`lr_scheduler.py:7-33`: SGD (momentum/dampening/nesterov) and Adam from
the config tree, with StepLR / MultiStepLR / PolyLRDecay schedules.  In
optax the schedule is a pure ``step -> lr`` function folded into the
gradient transformation — no mutable scheduler object, no per-iter vs
per-epoch stepping ambiguity (callers pick the step unit by how often
they step, same as the reference's two call sites train.py:88 vs
distributed_train.py:267).
"""
from __future__ import annotations

from typing import Callable, Dict, Optional

import optax

_OPTIMIZER_BUILDERS: Dict[str, Callable] = {}
_SCHEDULER_BUILDERS: Dict[str, Callable] = {}


def register_optimizer_builder(name: str, builder: Callable) -> None:
    if name in _OPTIMIZER_BUILDERS:
        raise KeyError(f"Duplicate optimizer builder {name}")
    _OPTIMIZER_BUILDERS[name] = builder


def register_scheduler_builder(name: str, builder: Callable) -> None:
    if name in _SCHEDULER_BUILDERS:
        raise KeyError(f"Duplicate scheduler builder {name}")
    _SCHEDULER_BUILDERS[name] = builder


def polynomial_lr_decay(base_lr: float, max_iter: int, power: float = 0.9):
    """lr = base * (1 - step/max_iter)^power, frozen past max_iter.

    (ref lr_scheduler.py:27-33; the reference keeps returning the last lr
    once ``step >= max_iter``.)
    """
    assert max_iter > 1, "max_iter should be greater than 1"

    def schedule(step):
        import jax.numpy as jnp

        # the clip ceiling freezes the schedule at its step max_iter-1
        # value once step >= max_iter (the reference's keep-last behavior)
        frac = jnp.clip(step / max_iter, 0.0, (max_iter - 1) / max_iter)
        return base_lr * (1.0 - frac) ** power

    return schedule


def step_lr(base_lr: float, step_size: int, gamma: float = 0.1):
    """torch StepLR equivalent."""

    def schedule(step):
        import jax.numpy as jnp

        return base_lr * gamma ** jnp.floor(step / step_size)

    return schedule


def multi_step_lr(base_lr: float, milestones, gamma: float = 0.1):
    """torch MultiStepLR equivalent."""
    milestones = sorted(milestones)

    def schedule(step):
        import jax.numpy as jnp

        count = sum((step >= m).astype(int) if hasattr(step, "astype") else int(step >= m) for m in [jnp.asarray(m) for m in milestones])
        return base_lr * gamma ** count

    return schedule


def build_schedule(cfg) -> Optional[Callable]:
    """Config -> optax schedule fn (ref build.py:48-66)."""
    name = cfg.SCHEDULER.TYPE
    base_lr = cfg.OPTIMIZER.BASE_LR
    if name == "":
        return None
    if name == "PolyLRDecay":
        node = cfg.SCHEDULER.PolyLRDecay
        return polynomial_lr_decay(base_lr, node.max_iter, node.power)
    if name == "StepLR":
        node = cfg.SCHEDULER.StepLR
        return step_lr(base_lr, node.step_size, node.gamma)
    if name == "MultiStepLR":
        node = cfg.SCHEDULER.MultiStepLR
        return multi_step_lr(base_lr, list(node.milestones), node.gamma)
    if name in _SCHEDULER_BUILDERS:
        return _SCHEDULER_BUILDERS[name](cfg)
    raise ValueError(f"Unsupported scheduler {name!r}")


def build_optimizer(cfg, schedule: Optional[Callable] = None) -> optax.GradientTransformation:
    """Config -> optax gradient transformation (ref build.py:15-32).

    Matches torch semantics: weight decay is L2 added to the gradient
    (torch coupled style, not AdamW decoupled), momentum/dampening/
    nesterov for SGD.
    """
    name = cfg.OPTIMIZER.TYPE
    lr = schedule if schedule is not None else cfg.OPTIMIZER.BASE_LR
    wd = cfg.OPTIMIZER.WEIGHT_DECAY

    chain = []
    if wd > 0:
        chain.append(optax.add_decayed_weights(wd))

    if name == "SGD":
        node = cfg.OPTIMIZER.SGD
        if node.momentum > 0:
            # torch SGD: b = momentum*b + (1-dampening)*g; update = b (or
            # nesterov: g + momentum*b)
            chain.append(
                optax.trace(
                    decay=node.momentum,
                    nesterov=node.nesterov,
                    accumulator_dtype=None,
                )
            )
            if node.dampening > 0:
                raise NotImplementedError("SGD dampening > 0 is not supported")
        chain.append(optax.scale_by_learning_rate(lr))
    elif name == "Adam":
        node = cfg.OPTIMIZER.Adam
        b1, b2 = node.betas
        chain.append(optax.scale_by_adam(b1=b1, b2=b2))
        chain.append(optax.scale_by_learning_rate(lr))
    elif name in _OPTIMIZER_BUILDERS:
        return _OPTIMIZER_BUILDERS[name](cfg, lr)
    else:
        raise ValueError(f"Unsupported optimizer {name!r}")

    return optax.chain(*chain)
