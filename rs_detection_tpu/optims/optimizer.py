"""Optimizers as optax chains with grad clipping.

Capability parity with the reference optimizers
(``python/jdet/optims/optimizer.py``): ``SGD`` (:24), ``AdamW`` (:35),
``Adam`` (:78), ``GradMutilpySGD`` (per-group grad multiplier, :46),
and the ``pre_step`` grad-clip hook (clip_grad_norm) — here a
``clip_by_global_norm`` link at the head of the chain.

``lr`` may be a float or an optax schedule ``fn(step) -> lr`` — the
runner passes the warmup+decay schedule built from
``optims.lr_scheduler``, mirroring the reference's per-iter
``scheduler.step``.
"""

from __future__ import annotations

from typing import Dict, Optional, Union

import optax

from ..utils.registry import OPTIMS

LR = Union[float, optax.Schedule]


def _with_clip(tx: optax.GradientTransformation,
               grad_clip: Optional[Dict]) -> optax.GradientTransformation:
    if not grad_clip:
        return tx
    return optax.chain(
        optax.clip_by_global_norm(grad_clip.get("max_norm", 35)), tx)


@OPTIMS.register_module()
def SGD(lr: LR = 0.01, momentum=0.9, weight_decay=0.0001,
        grad_clip=None, nesterov=False, **kw):
    tx = optax.chain(
        optax.add_decayed_weights(weight_decay),
        optax.sgd(lr, momentum=momentum, nesterov=nesterov))
    return _with_clip(tx, grad_clip)


@OPTIMS.register_module()
def AdamW(lr: LR = 1e-4, betas=(0.9, 0.999), eps=1e-8,
          weight_decay=0.05, grad_clip=None, **kw):
    tx = optax.adamw(lr, b1=betas[0], b2=betas[1], eps=eps,
                     weight_decay=weight_decay)
    return _with_clip(tx, grad_clip)


@OPTIMS.register_module()
def Adam(lr: LR = 1e-3, betas=(0.9, 0.999), eps=1e-8, weight_decay=0.0,
         grad_clip=None, **kw):
    base = optax.adam(lr, b1=betas[0], b2=betas[1], eps=eps)
    if weight_decay:
        base = optax.chain(optax.add_decayed_weights(weight_decay), base)
    return _with_clip(base, grad_clip)


def _grad_multiplier(multipliers: Dict[str, float]):
    """Scale gradients whose parameter path contains a key substring."""

    def init(params):
        return optax.EmptyState()

    def update(updates, state, params=None):
        import jax

        flat, treedef = jax.tree_util.tree_flatten_with_path(updates)
        scaled = []
        for path, g in flat:
            path_str = "/".join(str(p) for p in path)
            factor = 1.0
            for k, v in multipliers.items():
                if k in path_str:
                    factor = v
                    break
            scaled.append(g * factor)
        return jax.tree_util.tree_unflatten(treedef, scaled), state

    return optax.GradientTransformation(init, update)


@OPTIMS.register_module()
def GradMutilpySGD(lr: LR = 0.01, momentum=0.9, weight_decay=0.0001,
                   grad_clip=None, multipliers=None, **kw):
    """SGD with per-parameter-label gradient multipliers
    (reference ``optimizer.py:46``)."""
    tx = optax.chain(
        _grad_multiplier(multipliers or {}),
        optax.add_decayed_weights(weight_decay),
        optax.sgd(lr, momentum=momentum))
    return _with_clip(tx, grad_clip)
