"""Core detection losses (pure jnp, weight-mask semantics).

Capability parity with the reference losses
(``python/jdet/models/losses/``): ``FocalLoss``
(focal_loss.py:36-98), ``SmoothL1Loss`` (smooth_l1_loss.py:30),
``L1Loss`` (l1_loss.py:22), ``CrossEntropyLoss`` /
``CrossEntropyLossForRcnn`` (cross_entropy_loss.py:35,130),
``BinaryCrossEntropyLoss`` (binary_cross_entropy_loss.py:29).

Every loss takes dense predictions/targets plus a weight array and an
``avg_factor`` — the static-shape counterpart of the reference's
sampled-index reductions.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ...utils.registry import LOSSES


def weight_reduce_loss(loss, weight=None, reduction="mean",
                       avg_factor=None):
    if weight is not None:
        loss = loss * weight
    if reduction == "none":
        return loss
    if reduction == "sum":
        return loss.sum()
    # mean
    if avg_factor is None:
        return loss.mean()
    return loss.sum() / jnp.maximum(avg_factor, 1.0)


def sigmoid_focal_loss(pred, target_onehot, weight=None, gamma=2.0,
                       alpha=0.25, reduction="mean", avg_factor=None):
    """Sigmoid focal loss from BCE-with-logits
    (reference ``focal_loss.py:36-75``).

    Args:
      pred: [N, C] logits.
      target_onehot: [N, C] {0,1} targets (background = all-zero row).
      weight: [N] or [N, C].
    """
    p = jax.nn.sigmoid(pred)
    ce = optax_sigmoid_bce(pred, target_onehot)
    p_t = p * target_onehot + (1 - p) * (1 - target_onehot)
    alpha_t = alpha * target_onehot + (1 - alpha) * (1 - target_onehot)
    loss = alpha_t * ((1 - p_t) ** gamma) * ce
    if weight is not None and weight.ndim == 1:
        weight = weight[:, None]
    return weight_reduce_loss(loss, weight, reduction, avg_factor)


def optax_sigmoid_bce(logits, labels):
    """Numerically-stable BCE with logits."""
    return jnp.maximum(logits, 0) - logits * labels + \
        jnp.log1p(jnp.exp(-jnp.abs(logits)))


def smooth_l1_loss(pred, target, weight=None, beta=1.0, reduction="mean",
                   avg_factor=None):
    """Reference ``smooth_l1_loss.py:8-28``."""
    diff = jnp.abs(pred - target)
    loss = jnp.where(diff < beta, 0.5 * diff * diff / beta,
                     diff - 0.5 * beta)
    return weight_reduce_loss(loss, weight, reduction, avg_factor)


def l1_loss(pred, target, weight=None, reduction="mean", avg_factor=None):
    return weight_reduce_loss(jnp.abs(pred - target), weight, reduction,
                              avg_factor)


def softmax_cross_entropy(pred, label, weight=None, reduction="mean",
                          avg_factor=None, ignore_index=-1):
    """Per-sample softmax CE over int labels
    (reference ``cross_entropy_loss.py:8-33``)."""
    logp = jax.nn.log_softmax(pred, axis=-1)
    valid = label != ignore_index
    safe_label = jnp.where(valid, label, 0)
    nll = -jnp.take_along_axis(logp, safe_label[..., None],
                               axis=-1)[..., 0]
    nll = jnp.where(valid, nll, 0.0)
    return weight_reduce_loss(nll, weight, reduction, avg_factor)


def binary_cross_entropy(pred, label, weight=None, reduction="mean",
                         avg_factor=None):
    loss = optax_sigmoid_bce(pred, label)
    return weight_reduce_loss(loss, weight, reduction, avg_factor)


@LOSSES.register_module()
class FocalLoss:
    def __init__(self, use_sigmoid=True, gamma=2.0, alpha=0.25,
                 reduction="mean", loss_weight=1.0):
        assert use_sigmoid
        self.gamma = gamma
        self.alpha = alpha
        self.reduction = reduction
        self.loss_weight = loss_weight

    def __call__(self, pred, target, weight=None, avg_factor=None):
        """``target``: int labels [N] with 0 = background, k>0 = class k
        -> one-hot over C channels for class k-1 (reference convention:
        cls branch has num_classes-1 sigmoid outputs)."""
        num_classes = pred.shape[-1]
        onehot = jax.nn.one_hot(target - 1, num_classes, dtype=pred.dtype)
        return self.loss_weight * sigmoid_focal_loss(
            pred, onehot, weight, self.gamma, self.alpha, self.reduction,
            avg_factor)


@LOSSES.register_module()
class SmoothL1Loss:
    def __init__(self, beta=1.0, reduction="mean", loss_weight=1.0):
        self.beta = beta
        self.reduction = reduction
        self.loss_weight = loss_weight

    def __call__(self, pred, target, weight=None, avg_factor=None):
        return self.loss_weight * smooth_l1_loss(
            pred, target, weight, self.beta, self.reduction, avg_factor)


@LOSSES.register_module()
class L1Loss:
    def __init__(self, reduction="mean", loss_weight=1.0):
        self.reduction = reduction
        self.loss_weight = loss_weight

    def __call__(self, pred, target, weight=None, avg_factor=None):
        return self.loss_weight * l1_loss(pred, target, weight,
                                          self.reduction, avg_factor)


@LOSSES.register_module()
class CrossEntropyLoss:
    def __init__(self, use_sigmoid=False, use_bce=False, reduction="mean",
                 loss_weight=1.0, ignore_index=-1):
        self.use_sigmoid = use_sigmoid or use_bce
        self.reduction = reduction
        self.loss_weight = loss_weight
        self.ignore_index = ignore_index

    def __call__(self, pred, target, weight=None, avg_factor=None):
        if self.use_sigmoid:
            loss = binary_cross_entropy(pred, target, weight,
                                        self.reduction, avg_factor)
        else:
            loss = softmax_cross_entropy(pred, target, weight,
                                         self.reduction, avg_factor,
                                         self.ignore_index)
        return self.loss_weight * loss


@LOSSES.register_module()
class CrossEntropyLossForRcnn(CrossEntropyLoss):
    """RCNN variant (reference ``cross_entropy_loss.py:130``)."""


@LOSSES.register_module()
class BinaryCrossEntropyLoss:
    def __init__(self, reduction="mean", loss_weight=1.0):
        self.reduction = reduction
        self.loss_weight = loss_weight

    def __call__(self, pred, target, weight=None, avg_factor=None):
        return self.loss_weight * binary_cross_entropy(
            pred, target, weight, self.reduction, avg_factor)
