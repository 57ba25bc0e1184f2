"""Rotated RetinaNet head.

Capability parity with the reference ``RetinaHead``
(``python/jdet/models/roi_heads/retina_head.py``, 353 LoC): 4 stacked
cls/reg conv towers over FPN levels, rotated anchors (octave scales x
ratios), XYWHA delta regression, sigmoid focal classification; the
legacy loc/label-creator targeting becomes the shared static-shape
``anchor_target`` pipeline.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ...ops import box_ops as B
from ...ops.nms import fast_top_k
from ...ops.nms_rotated import multiclass_nms_rotated_jit
from ...utils.registry import HEADS
from ..boxes.anchor_generator import AnchorGeneratorRotatedS2ANet
from ..boxes.anchor_target import anchor_target_single
from ..boxes.assigner import MaxIoUAssigner
from ..boxes.coder import DeltaXYWHABBoxCoder
from ..boxes.sampler import PseudoSampler
from ..losses.common import sigmoid_focal_loss, smooth_l1_loss


def _octave_scales(octave_base_scale=4, scales_per_octave=3):
    return [octave_base_scale * 2 ** (i / scales_per_octave)
            for i in range(scales_per_octave)]


@HEADS.register_module()
class RetinaHead(nn.Module):
    num_classes: int = 16            # includes background
    in_channels: int = 256
    feat_channels: int = 256
    stacked_convs: int = 4
    anchor_strides: Sequence[int] = (8, 16, 32, 64, 128)
    anchor_ratios: Sequence[float] = (0.5, 1.0, 2.0)
    octave_base_scale: int = 4
    scales_per_octave: int = 3
    anchor_angles: Sequence[float] = (0.0,)
    target_means: Sequence[float] = (0.0,) * 5
    target_stds: Sequence[float] = (1.0,) * 5
    focal_gamma: float = 2.0
    focal_alpha: float = 0.25
    smooth_l1_beta: float = 1.0 / 9.0
    nms_pre: int = 2000
    score_thr: float = 0.05
    nms_iou_thr: float = 0.1
    max_per_img: int = 2000
    pos_iou_thr: float = 0.5
    neg_iou_thr: float = 0.4
    min_pos_iou: float = 0.0

    def setup(self):
        self.cls_out_channels = self.num_classes - 1
        scales = _octave_scales(self.octave_base_scale,
                                self.scales_per_octave)
        self._anchor_gens = [
            AnchorGeneratorRotatedS2ANet(s, scales, self.anchor_ratios,
                                         angles=self.anchor_angles)
            for s in self.anchor_strides]
        self.num_anchors = self._anchor_gens[0].num_base_anchors
        self._coder = DeltaXYWHABBoxCoder(self.target_means,
                                          self.target_stds)
        self._assigner = MaxIoUAssigner(
            pos_iou_thr=self.pos_iou_thr, neg_iou_thr=self.neg_iou_thr,
            min_pos_iou=self.min_pos_iou,
            iou_calculator=dict(type="BboxOverlaps2D_rotated"))

        conv = lambda c, name: nn.Conv(
            c, (3, 3), padding=1,
            kernel_init=nn.initializers.normal(0.01), name=name)
        self.cls_convs = [conv(self.feat_channels, f"cls_{i}")
                          for i in range(self.stacked_convs)]
        self.reg_convs = [conv(self.feat_channels, f"reg_{i}")
                          for i in range(self.stacked_convs)]
        self.retina_cls = nn.Conv(
            self.num_anchors * self.cls_out_channels, (3, 3), padding=1,
            kernel_init=nn.initializers.normal(0.01),
            bias_init=nn.initializers.constant(
                float(-np.log(99.0))), name="retina_cls")
        self.retina_reg = conv(self.num_anchors * 5, "retina_reg")

    def __call__(self, feats, train: bool = False):
        cls_scores, bbox_preds = [], []
        for f in feats:
            c, r = f, f
            for conv in self.cls_convs:
                c = nn.relu(conv(c))
            for conv in self.reg_convs:
                r = nn.relu(conv(r))
            cls_scores.append(self.retina_cls(c))
            bbox_preds.append(self.retina_reg(r))
        return cls_scores, bbox_preds

    def _anchors(self, featmap_sizes):
        return jnp.asarray(np.concatenate([
            self._anchor_gens[i].grid_anchors(featmap_sizes[i],
                                              self.anchor_strides[i])
            for i in range(len(featmap_sizes))], 0))

    def loss(self, outs, targets):
        cls_scores, bbox_preds = outs
        gt_obb = targets["rboxes"]
        gt_mask = targets["gt_mask"]
        gt_labels = targets["labels"]
        b = gt_obb.shape[0]
        featmap_sizes = [tuple(c.shape[1:3]) for c in cls_scores]
        anchors = self._anchors(featmap_sizes)

        def per_image(obb, mask, labels):
            return anchor_target_single(
                anchors, jnp.ones(anchors.shape[0], bool), obb, mask,
                labels, self._assigner, PseudoSampler(),
                self._coder.encode)

        res = jax.vmap(per_image)(gt_obb, gt_mask, gt_labels)
        num_total = jnp.maximum(res.num_pos, 1).sum().astype(jnp.float32)
        cls = jnp.concatenate(
            [c.reshape(b, -1, self.cls_out_channels) for c in cls_scores],
            1)
        onehot = jax.nn.one_hot(res.labels - 1, self.cls_out_channels)
        loss_cls = sigmoid_focal_loss(
            cls.reshape(-1, self.cls_out_channels),
            onehot.reshape(-1, self.cls_out_channels),
            res.label_weights.reshape(-1), gamma=self.focal_gamma,
            alpha=self.focal_alpha, avg_factor=num_total)
        # regression loss in the conv's native NHWC [B, H, W, A*5]
        # layout: a [*, 5]-minor pred tensor lane-pads 128/5 on TPU and
        # relayouts on both fwd and cotangent (see
        # oriented_rpn_head.loss); reshape the non-differentiable
        # targets instead — anchor flat order (h, w, a) is exactly the
        # NHWC A-minor reshape (get_bboxes decodes with the same
        # reshape against grid_anchors)
        loss_bbox = 0.0
        start = 0
        for lvl, r in enumerate(bbox_preds):
            h_l, w_l = featmap_sizes[lvl]
            a_l = r.shape[-1] // 5
            n = h_l * w_l * a_l
            sl = slice(start, start + n)
            start += n
            nhwc = (b, h_l, w_l, a_l * 5)
            loss_bbox += smooth_l1_loss(
                r.astype(jnp.float32),
                res.bbox_targets[:, sl].reshape(nhwc),
                res.bbox_weights[:, sl].reshape(nhwc),
                beta=self.smooth_l1_beta, avg_factor=num_total)
        return dict(loss_cls=loss_cls, loss_bbox=loss_bbox)

    def get_bboxes(self, outs, targets):
        cls_scores, bbox_preds = outs
        b = cls_scores[0].shape[0]
        featmap_sizes = [tuple(c.shape[1:3]) for c in cls_scores]
        mlvl_anchors = [jnp.asarray(self._anchor_gens[i].grid_anchors(
            featmap_sizes[i], self.anchor_strides[i]))
            for i in range(len(featmap_sizes))]
        scale = targets.get("scale_factor", jnp.ones((b,))) \
            if targets else jnp.ones((b,))

        results = []
        for i in range(b):
            mlvl_boxes, mlvl_scores = [], []
            for lvl in range(len(cls_scores)):
                scores = jax.nn.sigmoid(cls_scores[lvl][i].reshape(
                    -1, self.cls_out_channels))
                deltas = bbox_preds[lvl][i].reshape(-1, 5)
                anchors = mlvl_anchors[lvl]
                k = min(self.nms_pre, scores.shape[0])
                _, top_i = fast_top_k(scores.max(1), k)
                mlvl_boxes.append(B.delta2bbox_rotated(
                    anchors[top_i], deltas[top_i], self.target_means,
                    self.target_stds))
                mlvl_scores.append(scores[top_i])
            boxes = jnp.concatenate(mlvl_boxes)
            boxes = boxes.at[:, :4].divide(jnp.maximum(scale[i], 1e-6))
            scores = jnp.concatenate(mlvl_scores)
            scores = jnp.concatenate(
                [jnp.zeros((scores.shape[0], 1)), scores], 1)
            dets, labels, valid = multiclass_nms_rotated_jit(
                boxes, scores, self.score_thr, self.nms_iou_thr,
                pre_nms=min(2000,
                            scores.shape[0] * self.cls_out_channels),
                max_num=self.max_per_img)
            polys = B.rotated_box_to_poly(dets[:, :5], best_begin=False)
            results.append((polys, dets[:, 5], labels, valid))
        return dict(
            polys=jnp.stack([r[0] for r in results]),
            scores=jnp.stack([r[1] for r in results]),
            labels=jnp.stack([r[2] for r in results]),
            valid=jnp.stack([r[3] for r in results]))
