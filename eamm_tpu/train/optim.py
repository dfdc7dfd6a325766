"""Optimizers and schedules (optax).

Reference: Adam(lr 2e-4, betas 0.5/0.999) with MultiStepLR milestones
[60, 90] epochs, gamma 0.1, last_epoch resume (ref:train.py:21,40-41,
configs ``train_params``).
"""
from __future__ import annotations

import optax


def multistep_schedule(base_lr: float, milestones_epochs, gamma: float,
                       steps_per_epoch: int) -> optax.Schedule:
    boundaries = {int(m * steps_per_epoch): gamma for m in milestones_epochs}
    return optax.piecewise_constant_schedule(base_lr, boundaries)


def make_optimizer(lr: float = 2e-4, b1: float = 0.5, b2: float = 0.999,
                   milestones_epochs=(60, 90), gamma: float = 0.1,
                   steps_per_epoch: int = 1) -> optax.GradientTransformation:
    schedule = multistep_schedule(lr, milestones_epochs, gamma, steps_per_epoch)
    return optax.adam(schedule, b1=b1, b2=b2)


def make_module_optimizer(module_lrs: dict, default_lr: float = 2e-4,
                          b1: float = 0.5, b2: float = 0.999,
                          milestones_epochs=(60, 90), gamma: float = 0.1,
                          steps_per_epoch: int = 1
                          ) -> optax.GradientTransformation:
    """Per-module Adam with the MultiStepLR schedule — the reference
    fine-tune keeps separate generator / audio optimizers+schedulers
    (ref:train.py:136-163); params are a {module_name: tree} dict and each
    top-level module routes to its own transform."""
    import jax

    def adam(lr):
        return optax.adam(multistep_schedule(lr, milestones_epochs, gamma,
                                             steps_per_epoch), b1=b1, b2=b2)

    transforms = {name: adam(lr) for name, lr in module_lrs.items()}
    transforms["__default__"] = adam(default_lr)

    def labels(tree):
        return {k: jax.tree.map(
            lambda _, lbl=(k if k in module_lrs else "__default__"): lbl, v)
            for k, v in tree.items()}

    return optax.multi_transform(transforms, labels)
