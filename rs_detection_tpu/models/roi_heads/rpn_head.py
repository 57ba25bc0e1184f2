"""Horizontal RPN head (Gliding Vertex / Faster R-CNN OBB /
RoI-Transformer stage 1).

Capability parity with the reference ``RPNHead`` /
``GlidingRPNHead`` (``python/jdet/models/roi_heads/rpn_head.py``,
``gliding_rpn_head.py:9``): 3x3 conv + 1x1 sigmoid cls + 1x1 4-dim
reg per anchor; targets via hbb MaxIoUAssigner + random 256-sampling
with ``DeltaXYWHBBoxCoder``; proposal generation with per-level top-k,
hbb decode, per-level-offset NMS, top ``nms_post`` hbb proposals.

Shares the static-shape machinery of ``OrientedRPNHead`` — only the
coder (4-dim hbb) and proposal box type differ.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ...ops import box_ops as B
from ...ops.nms import (_greedy_suppress_mask, overlap_gt_mask_hbb,
                         fast_top_k)
from ...utils.registry import HEADS
from ..boxes.anchor_generator import AnchorGenerator
from ..boxes.anchor_target import anchor_target_single
from ..boxes.assigner import MaxIoUAssigner
from ..boxes.coder import GVDeltaXYWHBBoxCoder
from ..boxes.sampler import RandomSampler
from ..losses.common import binary_cross_entropy, smooth_l1_loss


@HEADS.register_module()
class RPNHead(nn.Module):
    in_channels: int = 256
    feat_channels: int = 256
    min_bbox_size: float = 0.0
    nms_thresh: float = 0.7
    nms_pre: int = 2000
    nms_post: int = 2000
    pre_nms_cap: int = 4096
    pos_weight: float = -1.0
    allowed_border: int = 0
    anchor_generator: Any = None
    target_means: Sequence[float] = (0.0,) * 4
    target_stds: Sequence[float] = (1.0,) * 4
    assigner: Any = None
    sampler: Any = None
    smooth_l1_beta: float = 1.0 / 9.0

    def setup(self):
        ag = self.anchor_generator or dict(
            scales=[8], ratios=[0.5, 1.0, 2.0],
            strides=[4, 8, 16, 32, 64])
        ag = {k: v for k, v in dict(ag).items() if k != "type"}
        self._anchor_gen = AnchorGenerator(**ag)
        self._coder = GVDeltaXYWHBBoxCoder(self.target_means,
                                           self.target_stds)
        asn = self.assigner or dict(pos_iou_thr=0.7, neg_iou_thr=0.3,
                                    min_pos_iou=0.3,
                                    match_low_quality=True)
        asn = {k: v for k, v in dict(asn).items()
               if k not in ("type", "assigned_labels_filled",
                            "iou_calculator", "ignore_iof_thr")}
        self._assigner = MaxIoUAssigner(**asn)
        smp = self.sampler or dict(num=256, pos_fraction=0.5)
        smp = {k: v for k, v in dict(smp).items() if k != "type"}
        self._sampler = RandomSampler(**smp)
        self.num_anchors = self._anchor_gen.num_base_anchors[0]

        self.rpn_conv = nn.Conv(self.feat_channels, (3, 3), padding=1,
                                kernel_init=nn.initializers.normal(0.01))
        self.rpn_cls = nn.Conv(self.num_anchors, (1, 1),
                               kernel_init=nn.initializers.normal(0.01))
        self.rpn_reg = nn.Conv(self.num_anchors * 4, (1, 1),
                               kernel_init=nn.initializers.normal(0.01))

    def __call__(self, feats, train: bool = False):
        # `train` is accepted for signature parity with OrientedRPNHead
        # (RCNN.loss calls self._rpn(feats, train=True) uniformly); the
        # hbb RPN has no train-only behavior (no dropout/BN).
        del train
        outs = [(self.rpn_cls(h), self.rpn_reg(h))
                for h in (nn.relu(self.rpn_conv(f)) for f in feats)]
        return [o[0] for o in outs], [o[1] for o in outs]

    def loss(self, cls_scores, bbox_preds, targets, rng):
        featmap_sizes = [tuple(c.shape[1:3]) for c in cls_scores]
        mlvl_anchors = self._anchor_gen.grid_anchors(featmap_sizes)
        flat_anchors = jnp.asarray(np.concatenate(mlvl_anchors, 0))
        gt_hbb = targets["hboxes"]
        gt_mask = targets["gt_mask"]
        b = gt_hbb.shape[0]
        img_h = targets["img_hw"][:, 0].max()
        img_w = targets["img_hw"][:, 1].max()
        inside = ((flat_anchors[:, 0] >= -self.allowed_border)
                  & (flat_anchors[:, 1] >= -self.allowed_border)
                  & (flat_anchors[:, 2] < img_w + self.allowed_border)
                  & (flat_anchors[:, 3] < img_h + self.allowed_border))
        keys = jax.random.split(rng, b)

        def per_image(hbb, mask, key):
            return anchor_target_single(
                flat_anchors, inside, hbb, mask, None, self._assigner,
                self._sampler, self._coder.encode, key=key,
                pos_weight=self.pos_weight)

        res = jax.vmap(per_image)(gt_hbb, gt_mask, keys)
        num_total = (jnp.maximum(res.num_pos, 1)
                     + jnp.maximum(res.num_neg, 1)).sum()
        cls = jnp.concatenate([c.reshape(b, -1) for c in cls_scores], 1)
        reg = jnp.concatenate([r.reshape(b, -1, 4) for r in bbox_preds],
                              1)
        loss_cls = binary_cross_entropy(
            cls, res.labels.astype(jnp.float32), res.label_weights,
            avg_factor=num_total)
        loss_bbox = smooth_l1_loss(
            reg, res.bbox_targets, res.bbox_weights,
            beta=self.smooth_l1_beta, avg_factor=num_total)
        return dict(loss_rpn_cls=loss_cls, loss_rpn_bbox=loss_bbox)

    def get_proposals(self, cls_scores, bbox_preds, img_hw):
        """-> (proposals [B, nms_post, 4] hbb, scores, valid)."""
        featmap_sizes = [tuple(c.shape[1:3]) for c in cls_scores]
        mlvl_anchors = [jnp.asarray(a) for a in
                        self._anchor_gen.grid_anchors(featmap_sizes)]
        b = cls_scores[0].shape[0]

        def per_image(cls_list, reg_list):
            cand_s, cand_d, cand_a, cand_l = [], [], [], []
            for lvl in range(len(cls_list)):
                scores = jax.nn.sigmoid(cls_list[lvl].reshape(-1))
                deltas = reg_list[lvl].reshape(-1, 4)
                anchors = mlvl_anchors[lvl]
                k = min(self.nms_pre, scores.shape[0])
                top_s, top_i = fast_top_k(scores, k)
                cand_s.append(top_s)
                cand_d.append(deltas[top_i])
                cand_a.append(anchors[top_i])
                cand_l.append(jnp.full((k,), lvl, jnp.float32))
            scores = jnp.concatenate(cand_s)
            deltas = jnp.concatenate(cand_d)
            anchors = jnp.concatenate(cand_a)
            lvl_ids = jnp.concatenate(cand_l)
            cap = min(self.pre_nms_cap, scores.shape[0])
            scores, sel = jax.lax.top_k(scores, cap)
            proposals = B.delta2bbox(anchors[sel], deltas[sel],
                                     self._coder.means,
                                     self._coder.stds)
            lvl_ids = lvl_ids[sel]
            w = proposals[:, 2] - proposals[:, 0]
            h = proposals[:, 3] - proposals[:, 1]
            ok = (w > self.min_bbox_size) & (h > self.min_bbox_size)
            span = proposals.max() - proposals.min()
            shifted = proposals + (lvl_ids * (span + 1.0))[:, None]
            order = jnp.argsort(-jnp.where(ok, scores, -jnp.inf))
            over = overlap_gt_mask_hbb(shifted[order], self.nms_thresh)
            keep_sorted = _greedy_suppress_mask(over, ok[order])
            keep = jnp.zeros_like(ok).at[order].set(keep_sorted)
            kept = jnp.where(keep, scores, -jnp.inf)
            out_s, out_i = jax.lax.top_k(kept, min(self.nms_post, cap))
            out_p = proposals[out_i]
            out_valid = jnp.isfinite(out_s)
            if self.nms_post > cap:
                pad = self.nms_post - cap
                out_p = jnp.pad(out_p, ((0, pad), (0, 0)))
                out_s = jnp.pad(out_s, (0, pad),
                                constant_values=-jnp.inf)
                out_valid = jnp.pad(out_valid, (0, pad))
            return out_p, jnp.where(out_valid, out_s, 0.0), out_valid

        outs = [per_image([c[i] for c in cls_scores],
                          [r[i] for r in bbox_preds]) for i in range(b)]
        return (jnp.stack([o[0] for o in outs]),
                jnp.stack([o[1] for o in outs]),
                jnp.stack([o[2] for o in outs]))


@HEADS.register_module()
class GlidingRPNHead(RPNHead):
    """Reference ``gliding_rpn_head.py:9`` — identical hbb RPN."""


# legacy registry names (reference roi_heads/{anchor_generator,
# fasterrcnn_head}.py classic Faster-RCNN path): resolve to the modern
# equivalents — AnchorHead is the dense anchor head, FasterrcnnHead the
# shared-FC two-stage box head
def _register_legacy_heads():
    from .rbbox_head import RoITransformerHead
    from .retina_head import RetinaHead

    HEADS.register_module(name="AnchorHead", module=RetinaHead)
    HEADS.register_module(name="FasterrcnnHead",
                          module=RoITransformerHead)


_register_legacy_heads()
