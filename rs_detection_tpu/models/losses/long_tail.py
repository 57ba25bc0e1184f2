"""Long-tail classification losses: Seesaw, EQLv2, EFL, GroupSoftmax.

Capability parity with the reference long-tail loss suite
(``python/jdet/models/losses/``): ``SeesawLoss`` (seesaw_loss.py:168,
mitigation + compensation factors over cumulative class counts),
``EQLv2`` (eqlv2.py:11, gradient-ratio reweighted BCE with
cross-replica gradient statistics — the reference's
``mpi_all_reduce`` becomes ``jax.lax.psum`` when running under a named
data axis, or is already global under jit sharding), and
``EqualizedFocalLoss`` (efl.py:12, category-adaptive focal gamma),
``GroupSoftmax`` (group_softmax.py:64).

JAX reformulation: these losses are *stateful* in the reference
(running statistics mutated every step). Here each is a pure function
``(cls_score, label, state) -> (loss, new_state)`` with an explicit
``init_state()``; callers thread the state through the train step like
any other mutable collection.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ...utils.registry import LOSSES
from .common import optax_sigmoid_bce, weight_reduce_loss


def _maybe_psum(x, axis_name: Optional[str]):
    if axis_name is None:
        return x
    try:
        return jax.lax.psum(x, axis_name)
    except NameError:
        return x


# ---------------------------------------------------------------------------
# Seesaw
# ---------------------------------------------------------------------------

class SeesawState(NamedTuple):
    cum_samples: jnp.ndarray  # [C+2] cumulative per-class counts


def seesaw_ce_loss(cls_score, labels, label_weights, cum_samples,
                   num_classes, p=0.8, q=2.0, eps=1e-2,
                   reduction="mean", avg_factor=None):
    """Reference ``seesaw_loss.py:99-165``."""
    onehot = jax.nn.one_hot(labels, num_classes, dtype=cls_score.dtype)
    weights = jnp.ones_like(onehot)
    if p > 0:
        cs = jnp.clip(cum_samples[:num_classes], 1, None)
        ratio = cs[None, :] / cs[:, None]
        idx = (ratio < 1.0).astype(cls_score.dtype)
        sw = (ratio ** p) * idx + (1 - idx)
        weights = weights * sw[labels]
    if q > 0:
        scores = jax.lax.stop_gradient(
            jax.nn.softmax(cls_score, axis=1))
        self_scores = jnp.take_along_axis(
            scores, labels[:, None], axis=1)[:, 0]
        sm = scores / jnp.clip(self_scores[:, None], eps, None)
        idx = (sm > 1.0).astype(cls_score.dtype)
        cf = (sm ** q) * idx + (1 - idx)
        weights = weights * cf
    score = cls_score + jnp.log(jnp.clip(weights, 1e-12, None)) \
        * (1 - onehot)
    logp = jax.nn.log_softmax(score, axis=-1)
    nll = -jnp.take_along_axis(logp, labels[:, None], axis=1)[:, 0]
    return weight_reduce_loss(nll, label_weights, reduction, avg_factor)


@LOSSES.register_module()
class SeesawLoss:
    """Seesaw loss with the objectness split (reference :168-257):
    channels = C + 2 — C class logits + 2 objectness logits."""

    def __init__(self, use_sigmoid=False, p=0.8, q=2.0,
                 num_classes=15, eps=1e-2, reduction="mean",
                 loss_weight=1.0):
        assert not use_sigmoid
        self.p = p
        self.q = q
        self.num_classes = num_classes
        self.eps = eps
        self.reduction = reduction
        self.loss_weight = loss_weight

    def get_cls_channels(self, num_classes):
        return num_classes + 2

    def init_state(self) -> SeesawState:
        return SeesawState(cum_samples=jnp.zeros(self.num_classes + 2))

    def split_cls_score(self, cls_score):
        return cls_score[..., :self.num_classes], \
            cls_score[..., self.num_classes:]

    def get_activation(self, cls_score):
        cls, obj = self.split_cls_score(cls_score)
        cls = jax.nn.softmax(cls, -1)
        obj = jax.nn.softmax(obj, -1)
        # fg prob = p(class) * p(object); bg prob appended last
        return jnp.concatenate(
            [cls * obj[..., :1], obj[..., 1:]], axis=-1)

    def __call__(self, cls_score, labels, state: SeesawState,
                 weight=None, avg_factor=None,
                 axis_name: Optional[str] = None):
        """labels: 0-based FG, == num_classes for background."""
        cls_sc, obj_sc = self.split_cls_score(cls_score)
        pos = labels < self.num_classes
        obj_labels = (labels == self.num_classes).astype(jnp.int32)

        # accumulate class counts (global across replicas)
        counts = jax.nn.one_hot(labels, self.num_classes + 2).sum(0)
        counts = _maybe_psum(counts, axis_name)
        new_state = SeesawState(cum_samples=state.cum_samples + counts)

        safe_labels = jnp.where(pos, labels, 0)
        loss_cls = seesaw_ce_loss(
            cls_sc, safe_labels,
            (pos.astype(jnp.float32)
             * (weight if weight is not None else 1.0)),
            new_state.cum_samples, self.num_classes, self.p, self.q,
            self.eps, self.reduction,
            avg_factor if avg_factor is not None
            else jnp.maximum(pos.sum(), 1))
        logp = jax.nn.log_softmax(obj_sc, axis=-1)
        nll = -jnp.take_along_axis(logp, obj_labels[:, None], 1)[:, 0]
        loss_obj = weight_reduce_loss(nll, weight, self.reduction,
                                      avg_factor)
        return self.loss_weight * (loss_cls + loss_obj), new_state


# ---------------------------------------------------------------------------
# EQLv2
# ---------------------------------------------------------------------------

class EQLv2State(NamedTuple):
    pos_grad: jnp.ndarray
    neg_grad: jnp.ndarray


@LOSSES.register_module()
class EQLv2:
    """Gradient-ratio balanced sigmoid loss (reference ``eqlv2.py``).
    Channel layout: C classes + 1 objectness (last)."""

    def __init__(self, use_sigmoid=True, num_classes=1203, gamma=12,
                 mu=0.8, alpha=4.0, reduction="mean", loss_weight=1.0,
                 test_with_obj=True):
        self.num_classes = num_classes
        self.gamma = gamma
        self.mu = mu
        self.alpha = alpha
        self.reduction = reduction
        self.loss_weight = loss_weight
        self.test_with_obj = test_with_obj

    def get_channel_num(self, num_classes):
        return num_classes + 1

    def init_state(self) -> EQLv2State:
        return EQLv2State(pos_grad=jnp.full((self.num_classes,), 1e-4),
                          neg_grad=jnp.full((self.num_classes,), 1e-4))

    def _map_func(self, x):
        return 1.0 / (1.0 + jnp.exp(-self.gamma * (x - self.mu)))

    def get_activation(self, cls_score):
        s = jax.nn.sigmoid(cls_score)
        if self.test_with_obj:
            bg = s[:, -1:]
            s = jnp.concatenate([s[:, :-1] * (1 - bg), bg], axis=1)
        return s

    def __call__(self, cls_score, label, state: EQLv2State,
                 weight=None, avg_factor=None,
                 axis_name: Optional[str] = None):
        n_i, n_c = cls_score.shape
        target = jax.nn.one_hot(label, n_c, dtype=cls_score.dtype)

        pos_neg = state.pos_grad / state.neg_grad
        neg_w = jnp.concatenate([self._map_func(pos_neg),
                                 jnp.ones((1,))])
        pos_w = 1 + self.alpha * (1 - neg_w)
        w = pos_w[None] * target + neg_w[None] * (1 - target)

        ce = optax_sigmoid_bce(cls_score, target)
        loss = (ce * w).sum() / n_i

        # grad statistics (detached), cross-replica summed
        prob = jax.lax.stop_gradient(jax.nn.sigmoid(cls_score))
        grad = jnp.abs(target * (prob - 1) + (1 - target) * prob)
        wg = jax.lax.stop_gradient(w)
        pos_g = (grad * target * wg).sum(0)[:-1]
        neg_g = (grad * (1 - target) * wg).sum(0)[:-1]
        pos_g = _maybe_psum(pos_g, axis_name)
        neg_g = _maybe_psum(neg_g, axis_name)
        new_state = EQLv2State(pos_grad=state.pos_grad + pos_g,
                               neg_grad=state.neg_grad + neg_g)
        return self.loss_weight * loss, new_state


# ---------------------------------------------------------------------------
# EFL
# ---------------------------------------------------------------------------

class EFLState(NamedTuple):
    pos_grad: jnp.ndarray
    neg_grad: jnp.ndarray
    pos_neg: jnp.ndarray


@LOSSES.register_module()
class EqualizedFocalLoss:
    """Category-adaptive focal gamma (reference ``efl.py:12-135``)."""

    def __init__(self, use_sigmoid=True, num_classes=1203,
                 focal_gamma=2.0, focal_alpha=0.25, scale_factor=8.0,
                 reduction="mean", loss_weight=1.0, ignore_index=-1):
        self.num_classes = num_classes
        self.focal_gamma = focal_gamma
        self.focal_alpha = focal_alpha
        self.scale_factor = scale_factor
        self.reduction = reduction
        self.loss_weight = loss_weight

    def init_state(self) -> EFLState:
        return EFLState(pos_grad=jnp.zeros(self.num_classes),
                        neg_grad=jnp.zeros(self.num_classes),
                        pos_neg=jnp.ones(self.num_classes))

    def __call__(self, cls_score, label, state: EFLState, weight=None,
                 avg_factor=None, axis_name: Optional[str] = None):
        n_i, n_c = cls_score.shape
        target = jax.nn.one_hot(label, n_c + 1,
                                dtype=cls_score.dtype)[:, :-1]
        pred = jax.nn.sigmoid(cls_score)
        pred_t = pred * target + (1 - pred) * (1 - target)

        map_val = 1 - state.pos_neg
        dy_gamma = self.focal_gamma + self.scale_factor * map_val
        ff = jax.lax.stop_gradient(
            jnp.broadcast_to(dy_gamma[None], (n_i, n_c)))
        wf = ff / self.focal_gamma
        ce = -jnp.log(jnp.clip(pred_t, 1e-12, None))
        loss = ce * ((1 - pred_t) ** ff) * wf
        if self.focal_alpha >= 0:
            alpha_t = self.focal_alpha * target + \
                (1 - self.focal_alpha) * (1 - target)
            loss = alpha_t * loss
        loss = loss.sum() / n_i

        prob = jax.lax.stop_gradient(pred)
        grad = jnp.abs(target * (prob - 1) + (1 - target) * prob)
        pos_g = _maybe_psum((grad * target).sum(0), axis_name)
        neg_g = _maybe_psum((grad * (1 - target)).sum(0), axis_name)
        pos_grad = state.pos_grad + pos_g[:self.num_classes]
        neg_grad = state.neg_grad + neg_g[:self.num_classes]
        pos_neg = jnp.clip(pos_grad / jnp.clip(neg_grad, 1e-10, None),
                           0, 1)
        return self.loss_weight * loss, EFLState(pos_grad, neg_grad,
                                                 pos_neg)


@LOSSES.register_module()
class GroupSoftmax:
    """Group-wise softmax for long-tail classification
    (reference ``group_softmax.py:64``): classes are bucketed by
    frequency, each bucket gets its own softmax + an "others" logit."""

    def __init__(self, num_classes=15, groups=None, beta=8,
                 reduction="mean", loss_weight=1.0):
        self.num_classes = num_classes
        self.reduction = reduction
        self.loss_weight = loss_weight
        # default: one group (falls back to plain softmax CE); dataset
        # builders supply frequency-based buckets
        self.groups = groups or [list(range(num_classes + 1))]

    def __call__(self, cls_score, label, weight=None, avg_factor=None):
        total = 0.0
        for g in self.groups:
            idx = jnp.asarray(g)
            sub_score = cls_score[:, idx]
            # position of label inside the group; last slot = "other"
            in_group = jnp.isin(label, idx)
            mapping = jnp.zeros((cls_score.shape[1] + 1,), jnp.int32)
            mapping = mapping.at[idx].set(jnp.arange(len(g)))
            sub_label = jnp.where(in_group, mapping[label], len(g) - 1)
            logp = jax.nn.log_softmax(sub_score, -1)
            nll = -jnp.take_along_axis(logp, sub_label[:, None], 1)[:, 0]
            total = total + weight_reduce_loss(nll, weight,
                                               self.reduction,
                                               avg_factor)
        return self.loss_weight * total


@LOSSES.register_module()
class SoftDiceLoss:
    """Soft dice over sigmoid scores (reference
    ``soft_dice_loss.py:12``)."""

    def __init__(self, smooth=1.0, reduction="mean", loss_weight=1.0):
        self.smooth = smooth
        self.reduction = reduction
        self.loss_weight = loss_weight

    def __call__(self, pred, target, weight=None, avg_factor=None):
        p = jax.nn.sigmoid(pred)
        num = 2 * (p * target).sum(-1) + self.smooth
        den = p.sum(-1) + target.sum(-1) + self.smooth
        return self.loss_weight * weight_reduce_loss(
            1 - num / den, weight, self.reduction, avg_factor)


# ---------------------------------------------------------------------------
# EQLv2Impr — EQLv2 with accumulated-loss class reweighting
# ---------------------------------------------------------------------------

class EQLv2ImprState(NamedTuple):
    pos_grad: jnp.ndarray
    neg_grad: jnp.ndarray
    acc_loss: jnp.ndarray


@LOSSES.register_module()
class EQLv2Impr(EQLv2):
    """Improved EQLv2 (reference ``eqlv2_impr.py:11-150``): the EQLv2
    gradient-ratio pos/neg weights are ALSO weighted into the gradient
    statistics, and a per-class weight derived from each class's
    accumulated share of the loss (``1 / ((r/new_mu)^new_gamma +
    1/scale)``) rescales the per-class loss sums."""

    def __init__(self, use_sigmoid=True, num_classes=1203, gamma=12,
                 mu=0.8, alpha=4.0, new_gamma=0.5, new_mu=0.08,
                 scale_factor=10.0, reduction="mean", loss_weight=1.0,
                 test_with_obj=True, **kw):
        super().__init__(use_sigmoid=use_sigmoid,
                         num_classes=num_classes, gamma=gamma, mu=mu,
                         alpha=alpha, reduction=reduction,
                         loss_weight=loss_weight,
                         test_with_obj=test_with_obj)
        self.new_gamma = new_gamma
        self.new_mu = new_mu
        self.scale_factor = scale_factor

    def init_state(self) -> EQLv2ImprState:
        # reference starts pos_neg at 100 so pos_w == neg_w == 1
        return EQLv2ImprState(
            pos_grad=jnp.full((self.num_classes,), 100.0),
            neg_grad=jnp.ones((self.num_classes,)),
            acc_loss=jnp.full((self.num_classes,), 1e-10))

    def _map_new_func(self, r):
        x = r / self.new_mu
        return 1.0 / (x ** self.new_gamma + 1.0 / self.scale_factor)

    def __call__(self, cls_score, label, state: EQLv2ImprState,
                 weight=None, avg_factor=None,
                 axis_name: Optional[str] = None):
        n_i, n_c = cls_score.shape
        target = jax.nn.one_hot(label, n_c, dtype=cls_score.dtype)

        pos_neg = state.pos_grad / (state.neg_grad + 1e-10)
        neg_w = jnp.concatenate([self._map_func(pos_neg),
                                 jnp.ones((1,))])
        pos_w = 1 + self.alpha * (1 - neg_w)
        w = pos_w[None] * target + neg_w[None] * (1 - target)

        ratios = state.acc_loss / state.acc_loss.sum()
        cls_weight = jnp.concatenate([self._map_new_func(ratios),
                                      jnp.ones((1,))])

        ce = optax_sigmoid_bce(cls_score, target)
        eql_loss = (ce * w).sum(0) / n_i              # [C+1]
        imp_loss = eql_loss * cls_weight
        loss = imp_loss.sum()

        prob = jax.lax.stop_gradient(jax.nn.sigmoid(cls_score))
        grad = jnp.abs(target * (prob - 1) + (1 - target) * prob)
        wg = jax.lax.stop_gradient(w)
        pos_g = _maybe_psum((grad * target * wg).sum(0)[:-1], axis_name)
        neg_g = _maybe_psum((grad * (1 - target) * wg).sum(0)[:-1],
                            axis_name)
        new_state = EQLv2ImprState(
            pos_grad=state.pos_grad + pos_g,
            neg_grad=state.neg_grad + neg_g,
            acc_loss=state.acc_loss
            + jax.lax.stop_gradient(imp_loss[:-1]))
        return self.loss_weight * loss, new_state


# ---------------------------------------------------------------------------
# EFL v1 — gradient stats over ALL C+1 channels (incl. objectness)
# ---------------------------------------------------------------------------

@LOSSES.register_module()
class EqualizedFocalLossV1:
    """EFL variant collecting gradient statistics over every channel
    including the objectness/background one (reference
    ``eflv1.py:12-135``; the ``efl.py`` variant tracked only the C
    foreground channels)."""

    def __init__(self, use_sigmoid=True, num_classes=1203,
                 focal_gamma=2.0, focal_alpha=0.25, scale_factor=8.0,
                 reduction="mean", loss_weight=1.0,
                 test_with_obj=True, **kw):
        self.num_classes = num_classes
        self.focal_gamma = focal_gamma
        self.focal_alpha = focal_alpha
        self.scale_factor = scale_factor
        self.loss_weight = loss_weight
        self.test_with_obj = test_with_obj

    def get_channel_num(self, num_classes):
        return num_classes + 1

    def init_state(self) -> EFLState:
        c1 = self.num_classes + 1
        return EFLState(pos_grad=jnp.zeros(c1),
                        neg_grad=jnp.zeros(c1),
                        pos_neg=jnp.ones(c1))

    def get_activation(self, cls_score):
        s = jax.nn.sigmoid(cls_score)
        if self.test_with_obj:
            bg = s[:, -1:]
            s = jnp.concatenate([s[:, :-1] * (1 - bg), bg], axis=1)
        return s

    def __call__(self, cls_score, label, state: EFLState, weight=None,
                 avg_factor=None, axis_name: Optional[str] = None):
        n_i, n_c = cls_score.shape            # n_c = C + 1
        target = jax.nn.one_hot(label, n_c, dtype=cls_score.dtype)
        pred = jax.nn.sigmoid(cls_score)
        pred_t = pred * target + (1 - pred) * (1 - target)

        map_val = 1 - state.pos_neg           # [C+1]
        dy_gamma = self.focal_gamma + self.scale_factor * map_val
        ff = jax.lax.stop_gradient(
            jnp.broadcast_to(dy_gamma[None], (n_i, n_c)))
        wf = ff / self.focal_gamma
        ce = -jnp.log(jnp.clip(pred_t, 1e-12, None))
        loss = ce * ((1 - pred_t) ** ff) * wf
        if self.focal_alpha >= 0:
            alpha_t = self.focal_alpha * target + \
                (1 - self.focal_alpha) * (1 - target)
            loss = alpha_t * loss
        loss = loss.sum() / n_i

        prob = jax.lax.stop_gradient(pred)
        grad = jnp.abs(target * (prob - 1) + (1 - target) * prob)
        pos_grad = state.pos_grad + _maybe_psum((grad * target).sum(0),
                                                axis_name)
        neg_grad = state.neg_grad + _maybe_psum(
            (grad * (1 - target)).sum(0), axis_name)
        pos_neg = jnp.clip(pos_grad / (neg_grad + 1e-10), 0, 1)
        return self.loss_weight * loss, EFLState(pos_grad, neg_grad,
                                                 pos_neg)
