"""LR schedules as pure functions (optax-compatible).

Capability parity with the reference schedulers
(``python/jdet/optims/lr_scheduler.py``): ``WarmUpLR`` (:6,
constant/linear/exp warmup), ``StepLR`` (milestones, :196),
``CosineAnnealingLR`` (factor-based, used for SWA, :274), ``ExpLR``
(:322), ``PolyLR`` (:332), ``InvLR`` (:346).

Each factory returns ``schedule(step) -> lr`` usable directly with
optax injectable hyperparams; schedules compose warmup * decay exactly
like the reference's per-iter warmup + per-epoch decay.
"""

from __future__ import annotations

import math
from typing import Callable, Sequence

import jax.numpy as jnp

from ..utils.registry import SCHEDULERS


def warmup_factor(step, warmup: str, warmup_iters: int,
                  warmup_ratio: float):
    """Per-iter warmup factor (reference ``WarmUpLR.get_warmup_lr``)."""
    if warmup is None or warmup_iters <= 0:
        return jnp.ones_like(jnp.asarray(step, jnp.float32))
    t = jnp.clip(jnp.asarray(step, jnp.float32) / warmup_iters, 0.0, 1.0)
    if warmup == "constant":
        f = jnp.where(t < 1.0, warmup_ratio, 1.0)
    elif warmup == "linear":
        f = jnp.where(t < 1.0, 1.0 - (1.0 - t) * (1.0 - warmup_ratio), 1.0)
    elif warmup == "exp":
        f = jnp.where(t < 1.0, warmup_ratio ** (1.0 - t), 1.0)
    else:
        raise ValueError(warmup)
    return f


@SCHEDULERS.register_module()
class StepLR:
    """Milestone decay stepped by epoch (reference ``:196``)."""

    def __init__(self, milestones: Sequence[int], gamma: float = 0.1,
                 warmup=None, warmup_iters=0, warmup_ratio=1.0 / 3,
                 **kw):
        self.milestones = sorted(milestones)
        self.gamma = gamma
        self.warmup = warmup
        self.warmup_iters = warmup_iters
        self.warmup_ratio = warmup_ratio

    def __call__(self, base_lr: float, step, epoch) -> jnp.ndarray:
        e = jnp.asarray(epoch, jnp.float32)
        n = sum(jnp.where(e >= m, 1.0, 0.0) for m in self.milestones)
        lr = base_lr * (self.gamma ** n)
        return lr * warmup_factor(step, self.warmup, self.warmup_iters,
                                  self.warmup_ratio)


@SCHEDULERS.register_module()
class CosineAnnealingLR:
    """Factor-based cosine (reference ``:274``; used by SWA —
    ``eta_min`` may be a min_lr_ratio)."""

    def __init__(self, max_steps: int = 1, min_lr_ratio: float = 0.0,
                 warmup=None, warmup_iters=0, warmup_ratio=1.0 / 3, **kw):
        self.max_steps = max_steps
        self.min_lr_ratio = min_lr_ratio
        self.warmup = warmup
        self.warmup_iters = warmup_iters
        self.warmup_ratio = warmup_ratio

    def __call__(self, base_lr: float, step, epoch) -> jnp.ndarray:
        t = jnp.clip(jnp.asarray(epoch, jnp.float32) / self.max_steps,
                     0.0, 1.0)
        cos = 0.5 * (1.0 + jnp.cos(math.pi * t))
        lr = base_lr * (self.min_lr_ratio
                        + (1.0 - self.min_lr_ratio) * cos)
        return lr * warmup_factor(step, self.warmup, self.warmup_iters,
                                  self.warmup_ratio)


@SCHEDULERS.register_module()
class CosineAnnealingLRGroup(CosineAnnealingLR):
    """YOLO cosine schedule with warmup (reference ``lr_scheduler.py``
    ``CosineAnnealingLRGroup`` — cos_out form
    ``target + 0.5*(base-target)*(cos(pi*t)+1)``, equal to the
    parent's factor form).

    The reference variant additionally warms each optimizer param
    group from its own initial lr (``warmup_init_lr_pg``) and warms
    momentum (``warmup_initial_momentum``); this single-lr runner
    applies the primary group's schedule — the per-group offsets only
    shape the first ``warmup_iters`` (~3 epochs in the yolo recipe).
    Accepted and recorded for config parity.
    """

    def __init__(self, warmup_init_lr_pg=None,
                 warmup_initial_momentum=None, min_lr_ratio=0.2, **kw):
        # the reference makes max_steps a required positional arg —
        # silently defaulting to 1 would collapse the cosine to min_lr
        # after epoch 0
        me = kw.pop("max_epoch", None)
        if "max_steps" not in kw:
            if not me:
                raise TypeError(
                    "CosineAnnealingLRGroup requires max_steps (or "
                    "max_epoch), as in the reference lr_scheduler")
            kw["max_steps"] = me
        super().__init__(min_lr_ratio=min_lr_ratio, **kw)
        self.warmup_init_lr_pg = warmup_init_lr_pg
        self.warmup_initial_momentum = warmup_initial_momentum


@SCHEDULERS.register_module()
class ExpLR:
    def __init__(self, gamma: float = 0.9, warmup=None, warmup_iters=0,
                 warmup_ratio=1.0 / 3, **kw):
        self.gamma = gamma
        self.warmup = warmup
        self.warmup_iters = warmup_iters
        self.warmup_ratio = warmup_ratio

    def __call__(self, base_lr, step, epoch):
        lr = base_lr * (self.gamma ** jnp.asarray(epoch, jnp.float32))
        return lr * warmup_factor(step, self.warmup, self.warmup_iters,
                                  self.warmup_ratio)


@SCHEDULERS.register_module()
class PolyLR:
    def __init__(self, max_steps: int = 1, power: float = 0.9,
                 min_lr: float = 0.0, warmup=None, warmup_iters=0,
                 warmup_ratio=1.0 / 3, **kw):
        self.max_steps = max_steps
        self.power = power
        self.min_lr = min_lr
        self.warmup = warmup
        self.warmup_iters = warmup_iters
        self.warmup_ratio = warmup_ratio

    def __call__(self, base_lr, step, epoch):
        t = jnp.clip(jnp.asarray(epoch, jnp.float32) / self.max_steps,
                     0.0, 1.0)
        lr = (base_lr - self.min_lr) * ((1.0 - t) ** self.power) \
            + self.min_lr
        return lr * warmup_factor(step, self.warmup, self.warmup_iters,
                                  self.warmup_ratio)


@SCHEDULERS.register_module()
class InvLR:
    def __init__(self, gamma: float = 0.1, power: float = 0.75,
                 warmup=None, warmup_iters=0, warmup_ratio=1.0 / 3, **kw):
        self.gamma = gamma
        self.power = power
        self.warmup = warmup
        self.warmup_iters = warmup_iters
        self.warmup_ratio = warmup_ratio

    def __call__(self, base_lr, step, epoch):
        s = jnp.asarray(step, jnp.float32)
        lr = base_lr * (1.0 + self.gamma * s) ** (-self.power)
        return lr * warmup_factor(step, self.warmup, self.warmup_iters,
                                  self.warmup_ratio)


# warmup-only scheduler names used in configs
@SCHEDULERS.register_module()
class WarmUpLR(StepLR):
    def __init__(self, warmup="linear", warmup_iters=500,
                 warmup_ratio=1.0 / 3, **kw):
        super().__init__(milestones=[], warmup=warmup,
                         warmup_iters=warmup_iters,
                         warmup_ratio=warmup_ratio)


@SCHEDULERS.register_module()
class WarmUpLRGroup(WarmUpLR):
    """Per-param-group warmup (reference ``:72``); group scaling is
    applied by the optimizer's param-group masks."""
