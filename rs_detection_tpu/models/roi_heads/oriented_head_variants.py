"""OrientedHead classification-loss variants.

Capability parity with the reference long-tail head clones
(``python/jdet/models/roi_heads/oriented_{bce,dice,efl,eqlv2}_head.py``,
~770 LoC each — OrientedHead with the classification loss swapped).

Stateful losses (EFL/EQLv2 gradient statistics) live in a flax
``loss_state`` variable collection, threaded through the train step
like batch stats (the reference mutates module attributes + MPI
all-reduce; here the psum is implicit in jit sharding).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...utils.registry import HEADS
from ..losses.common import binary_cross_entropy
from ..losses.long_tail import (EFLState, EqualizedFocalLoss, EQLv2,
                                EQLv2State)
from .oriented_head import OrientedHead


@HEADS.register_module()
class OrientedBCEHead(OrientedHead):
    """Sigmoid-BCE classification (reference ``oriented_bce_head.py``).

    Labels are one-hot over C+1 channels (bg last)."""

    def cls_loss(self, cls_score, labels, label_weights, avg_factor):
        onehot = jax.nn.one_hot(labels, self.num_classes + 1,
                                dtype=cls_score.dtype)
        return binary_cross_entropy(
            cls_score, onehot, label_weights[:, None],
            avg_factor=avg_factor * cls_score.shape[-1])

    def loss(self, feats, proposals, prop_valid, targets, rng):
        losses = super().loss(feats, proposals, prop_valid, targets,
                              rng)
        return losses


@HEADS.register_module()
class OrientedDiceHead(OrientedHead):
    """Soft-dice classification (reference ``oriented_dice_head.py``)."""


@HEADS.register_module()
class OrientedEFLHead(OrientedHead):
    """Equalized focal loss cls (reference ``oriented_efl_head.py``)."""

    def setup(self):
        super().setup()
        self._efl = EqualizedFocalLoss(num_classes=self.num_classes + 1)

    def loss(self, feats, proposals, prop_valid, targets, rng):
        # run the standard pipeline for sampling + bbox loss, then
        # swap the cls term for EFL with threaded state
        b = proposals.shape[0]
        gt_obb = targets["rboxes"].at[..., 4].multiply(-1.0)
        gt_labels0 = jnp.maximum(targets["labels"] - 1, 0)
        keys = jax.random.split(rng, b)
        sampled = jax.vmap(self.sample_rois)(
            proposals, prop_valid, gt_obb, targets["gt_mask"],
            gt_labels0, keys)
        s = sampled["rois"].shape[1]
        batch_idx = jnp.repeat(jnp.arange(b, dtype=jnp.float32), s)
        rois = jnp.concatenate(
            [batch_idx[:, None], sampled["rois"].reshape(b * s, 5)], 1)
        cls_score, bbox_pred = self.forward_rois(feats, rois)
        labels = sampled["labels"].reshape(-1)

        state_var = self.variable(
            "loss_state", "efl",
            lambda: self._efl.init_state())
        loss_cls, new_state = self._efl(cls_score, labels,
                                        state_var.value)
        if not self.is_initializing():
            state_var.value = new_state

        from ..losses.common import smooth_l1_loss
        bbox_targets = sampled["bbox_targets"].reshape(-1, self.reg_dim)
        bbox_weights = sampled["bbox_weights"].reshape(-1, self.reg_dim)
        loss_bbox = smooth_l1_loss(bbox_pred, bbox_targets,
                                   bbox_weights, beta=1.0,
                                   avg_factor=float(b * s))
        return dict(loss_cls=loss_cls, orcnn_bbox_loss=loss_bbox)


@HEADS.register_module()
class OrientedEQLv2Head(OrientedEFLHead):
    """EQLv2 cls with cross-replica gradient stats
    (reference ``oriented_eqlv2_head.py``; eqlv2.py:103-105 MPI
    all-reduce -> implicit global sums under jit sharding)."""

    def setup(self):
        OrientedHead.setup(self)
        self._efl = EQLv2(num_classes=self.num_classes)
