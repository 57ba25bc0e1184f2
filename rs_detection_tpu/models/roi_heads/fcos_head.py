"""Anchor-free rotated FCOS head.

Capability parity with the reference ``FCOSHead``
(``python/jdet/models/roi_heads/fcos_head.py:30-688``): 4-conv
group-norm cls/reg towers, per-level learnable Scale on the 4-distance
regression (+ theta branch, optionally scaled), centerness branch,
rotated point-in-box targeting (points rotated into each gt's frame,
min-area disambiguation, center sampling, per-level regress ranges),
``distance2obb`` decode, focal cls + rotated-IoU reg + BCE centerness.

TPU-first: targeting is one dense [P, G] masked computation vmapped
over the batch (no dynamic filtering), and the regression loss is the
differentiable poly-IoU on decoded obbs with centerness weighting.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ...ops import box_ops as B
from ...ops.nms import fast_top_k
from ...ops.nms_rotated import multiclass_nms_rotated_jit
from ...utils.registry import HEADS
from ..losses.common import (binary_cross_entropy, sigmoid_focal_loss)
from ..losses.poly_iou_loss import poly_iou_loss

INF = 1e8


@HEADS.register_module()
class FCOSHead(nn.Module):
    num_classes: int = 15              # fg classes (no background here)
    in_channels: int = 256
    feat_channels: int = 256
    stacked_convs: int = 4
    strides: Sequence[int] = (8, 16, 32, 64, 128)
    regress_ranges: Sequence[Tuple[float, float]] = (
        (-1, 64), (64, 128), (128, 256), (256, 512), (512, INF))
    center_sampling: bool = True
    center_sample_radius: float = 1.5
    norm_on_bbox: bool = True
    scale_theta: bool = True
    focal_gamma: float = 2.0
    focal_alpha: float = 0.25
    nms_pre: int = 2000
    score_thr: float = 0.05
    nms_iou_thr: float = 0.1
    max_per_img: int = 2000
    centerness_factor: float = 0.0

    def setup(self):
        conv = lambda c, name: nn.Conv(
            c, (3, 3), padding=1, use_bias=False,
            kernel_init=nn.initializers.normal(0.01), name=name)
        self.cls_convs = [(conv(self.feat_channels, f"cls_{i}"),
                           nn.GroupNorm(num_groups=32,
                                        name=f"cls_gn_{i}"))
                          for i in range(self.stacked_convs)]
        self.reg_convs = [(conv(self.feat_channels, f"reg_{i}"),
                           nn.GroupNorm(num_groups=32,
                                        name=f"reg_gn_{i}"))
                          for i in range(self.stacked_convs)]
        self.conv_cls = nn.Conv(
            self.num_classes, (3, 3), padding=1,
            kernel_init=nn.initializers.normal(0.01),
            bias_init=nn.initializers.constant(float(-np.log(99.0))),
            name="conv_cls")
        self.conv_reg = nn.Conv(4, (3, 3), padding=1,
                                kernel_init=nn.initializers.normal(0.01),
                                name="conv_reg")
        self.conv_theta = nn.Conv(1, (3, 3), padding=1,
                                  kernel_init=nn.initializers
                                  .normal(0.01), name="conv_theta")
        self.conv_centerness = nn.Conv(
            1, (3, 3), padding=1,
            kernel_init=nn.initializers.normal(0.01),
            name="conv_centerness")
        self.scales = self.param("scales", nn.initializers.ones,
                                 (len(self.strides),))
        if self.scale_theta:
            self.scale_t = self.param("scale_theta_p",
                                      nn.initializers.ones, ())

    # ------------------------------------------------------------------

    def forward_single(self, x, level: int, train: bool):
        cls_feat = x
        reg_feat = x
        for c, gn in self.cls_convs:
            cls_feat = nn.relu(gn(c(cls_feat)))
        for c, gn in self.reg_convs:
            reg_feat = nn.relu(gn(c(reg_feat)))
        cls_score = self.conv_cls(cls_feat)
        bbox_pred = self.conv_reg(reg_feat) * self.scales[level]
        if self.norm_on_bbox:
            bbox_pred = nn.relu(bbox_pred)
            if not train:
                bbox_pred = bbox_pred * self.strides[level]
        else:
            bbox_pred = jnp.exp(bbox_pred)
        theta = self.conv_theta(reg_feat)
        if self.scale_theta:
            theta = theta * self.scale_t
        centerness = self.conv_centerness(reg_feat)
        return cls_score, bbox_pred, theta, centerness

    def __call__(self, feats, train: bool = False):
        outs = [self.forward_single(f, i, train)
                for i, f in enumerate(feats)]
        return tuple(zip(*outs))

    # ------------------------------------------------------------------

    def _points(self, featmap_sizes):
        pts = []
        for (h, w), s in zip(featmap_sizes, self.strides):
            x = (np.arange(w) * s + s // 2).astype(np.float32)
            y = (np.arange(h) * s + s // 2).astype(np.float32)
            xx = np.tile(x, h)
            yy = np.repeat(y, w)
            pts.append(np.stack([xx, yy], -1))
        return pts

    def _target_single(self, points, point_strides, gt_obb, gt_mask,
                       gt_labels, regress_ranges):
        """Dense targets for one image (reference ``:599-670``)."""
        num_points = points.shape[0]
        g = gt_obb.shape[0]
        gt = B.mintheta_obb(gt_obb)
        ctr = gt[:, :2]
        wh = gt[:, 2:4]
        theta = gt[:, 4]
        areas = jnp.where(gt_mask, wh[:, 0] * wh[:, 1], INF)

        c, s = jnp.cos(theta), jnp.sin(theta)
        off = points[:, None, :] - ctr[None, :, :]      # [P, G, 2]
        ox = c[None] * off[..., 0] + s[None] * off[..., 1]
        oy = -s[None] * off[..., 0] + c[None] * off[..., 1]
        w2 = wh[None, :, 0] / 2
        h2 = wh[None, :, 1] / 2
        left = w2 + ox
        right = w2 - ox
        top = h2 + oy
        bottom = h2 - oy
        dists = jnp.stack([left, top, right, bottom], -1)  # [P, G, 4]

        inside = dists.min(-1) > 0
        if self.center_sampling:
            radius = point_strides * self.center_sample_radius
            inside_c = ((jnp.abs(ox) < radius[:, None])
                        & (jnp.abs(oy) < radius[:, None]))
            inside = inside & inside_c
        maxd = dists.max(-1)
        in_range = ((maxd >= regress_ranges[:, None, 0])
                    & (maxd <= regress_ranges[:, None, 1]))

        cand_areas = jnp.where(inside & in_range & gt_mask[None],
                               areas[None], INF)
        min_idx = cand_areas.argmin(1)
        min_area = cand_areas.min(1)
        labels0 = jnp.where(min_area < INF,
                            gt_labels[min_idx] - 1, self.num_classes)
        sel = jnp.take_along_axis(dists, min_idx[:, None, None]
                                  .repeat(4, -1), 1)[:, 0]
        sel_theta = theta[min_idx][:, None]
        bbox_targets = jnp.concatenate([sel, sel_theta], -1)
        return labels0.astype(jnp.int32), bbox_targets

    def loss(self, outs, targets):
        cls_scores, bbox_preds, theta_preds, centernesses = outs
        b = cls_scores[0].shape[0]
        featmap_sizes = [tuple(c.shape[1:3]) for c in cls_scores]
        pts_np = self._points(featmap_sizes)
        points = jnp.asarray(np.concatenate(pts_np, 0))
        point_strides = jnp.asarray(np.concatenate(
            [np.full(len(p), s, np.float32)
             for p, s in zip(pts_np, self.strides)]))
        rr = jnp.asarray(np.concatenate(
            [np.tile(np.asarray(r, np.float32)[None], (len(p), 1))
             for p, r in zip(pts_np, self.regress_ranges)]))

        labels, bbox_targets = jax.vmap(
            lambda obb, mask, lab: self._target_single(
                points, point_strides, obb, mask, lab, rr))(
            targets["rboxes"], targets["gt_mask"], targets["labels"])

        cls = jnp.concatenate(
            [c.reshape(b, -1, self.num_classes) for c in cls_scores], 1)
        reg4 = jnp.concatenate(
            [r.reshape(b, -1, 4) for r in bbox_preds], 1)
        th = jnp.concatenate(
            [t.reshape(b, -1, 1) for t in theta_preds], 1)
        ctr = jnp.concatenate(
            [cn.reshape(b, -1) for cn in centernesses], 1)
        if self.norm_on_bbox:
            reg4 = reg4 * point_strides[None, :, None]
        reg = jnp.concatenate([reg4, th], -1)

        flat_labels = labels.reshape(-1)
        pos = flat_labels < self.num_classes
        num_pos = jnp.maximum(pos.sum(), 1).astype(jnp.float32)

        onehot = jax.nn.one_hot(flat_labels, self.num_classes)
        loss_cls = sigmoid_focal_loss(
            cls.reshape(-1, self.num_classes), onehot,
            gamma=self.focal_gamma, alpha=self.focal_alpha,
            avg_factor=num_pos)

        flat_targets = bbox_targets.reshape(-1, 5)
        lr = flat_targets[:, jnp.array([0, 2])]
        tb = flat_targets[:, jnp.array([1, 3])]
        ctr_targets = jnp.sqrt(jnp.clip(
            (lr.min(-1) / jnp.maximum(lr.max(-1), 1e-6))
            * (tb.min(-1) / jnp.maximum(tb.max(-1), 1e-6)), 0, None))
        ctr_targets = jnp.where(pos, ctr_targets, 0.0)

        pts_all = jnp.tile(points, (b, 1))
        decoded_pred = B.distance2obb(pts_all, reg.reshape(-1, 5))
        decoded_tgt = B.distance2obb(pts_all, flat_targets)
        loss_bbox = poly_iou_loss(
            decoded_pred, decoded_tgt, linear=False,
            weight=ctr_targets,
            avg_factor=jnp.maximum(ctr_targets.sum(), 1e-6))
        loss_centerness = binary_cross_entropy(
            ctr.reshape(-1), ctr_targets,
            weight=pos.astype(jnp.float32), avg_factor=num_pos)
        return dict(loss_cls=loss_cls, loss_bbox=loss_bbox,
                    loss_centerness=loss_centerness)

    # ------------------------------------------------------------------

    def get_bboxes(self, outs, targets):
        cls_scores, bbox_preds, theta_preds, centernesses = outs
        b = cls_scores[0].shape[0]
        featmap_sizes = [tuple(c.shape[1:3]) for c in cls_scores]
        pts_np = self._points(featmap_sizes)
        scale = targets.get("scale_factor", jnp.ones((b,))) \
            if targets else jnp.ones((b,))

        results = []
        for i in range(b):
            mlvl_boxes, mlvl_scores, mlvl_ctr = [], [], []
            for lvl in range(len(cls_scores)):
                scores = jax.nn.sigmoid(
                    cls_scores[lvl][i].reshape(-1, self.num_classes))
                ctr = jax.nn.sigmoid(
                    centernesses[lvl][i].reshape(-1)) \
                    + self.centerness_factor
                reg = jnp.concatenate(
                    [bbox_preds[lvl][i].reshape(-1, 4),
                     theta_preds[lvl][i].reshape(-1, 1)], -1)
                pts = jnp.asarray(pts_np[lvl])
                k = min(self.nms_pre, scores.shape[0])
                _, top_i = fast_top_k(
                    (scores * ctr[:, None]).max(1), k)
                mlvl_boxes.append(B.distance2obb(pts[top_i],
                                                 reg[top_i]))
                mlvl_scores.append(scores[top_i])
                mlvl_ctr.append(ctr[top_i])
            boxes = jnp.concatenate(mlvl_boxes)
            boxes = boxes.at[:, :4].divide(jnp.maximum(scale[i], 1e-6))
            scores = jnp.concatenate(mlvl_scores)
            ctr = jnp.concatenate(mlvl_ctr)
            scores = jnp.concatenate(
                [jnp.zeros((scores.shape[0], 1)), scores], 1)
            dets, labels, valid = multiclass_nms_rotated_jit(
                boxes, scores, self.score_thr, self.nms_iou_thr,
                pre_nms=min(2000, scores.shape[0] * self.num_classes),
                max_num=self.max_per_img, score_factors=ctr)
            polys = B.rotated_box_to_poly(dets[:, :5], best_begin=False)
            results.append((polys, dets[:, 5], labels, valid))
        return dict(
            polys=jnp.stack([r[0] for r in results]),
            scores=jnp.stack([r[1] for r in results]),
            labels=jnp.stack([r[2] for r in results]),
            valid=jnp.stack([r[3] for r in results]))
