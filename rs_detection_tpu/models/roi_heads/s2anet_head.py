"""S2ANet head: FAM -> AlignConv -> ORConv -> ODM.

Capability parity with the reference ``S2ANetHead``
(``python/jdet/models/roi_heads/s2anet_head.py:20-723``): FAM reg
(5-dim on rotated anchors, 1/level) + train-only FAM cls;
``bbox_decode`` with ``wh_ratio_clip=1e-6`` producing refined anchors;
AlignConv = deformable conv sampling the refined rbox grid
(:657-723); ORConv2d (ARF) + RotationInvariantPooling for the ODM cls
tower; two anchor_target rounds (FAM on init anchors, ODM on refined);
focal + smooth-L1 losses averaged by num_pos; inference via per-level
top-k -> ``delta2bbox_rotated`` -> class-aware rotated NMS -> polys.

TPU-first: anchors are numpy constants; both target rounds vmap over
the batch; AlignConv offsets are computed in-graph (vectorized, no
per-image host loop) feeding the shared bilinear-gather deform conv;
ARF is a static weight gather; NMS is the fixed-size in-graph
``multiclass_nms_rotated_jit``. No angle flips (S2ANet uses the JDet
data convention directly — SURVEY A.1).
"""

from __future__ import annotations

from typing import Any, List, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ...ops import box_ops as B
from ...ops.nms import fast_top_k
from ...ops.deform_conv import deform_conv2d
from ...ops.nms_rotated import multiclass_nms_rotated_jit
from ...ops.orn import (active_rotating_filter, arf_gather_indices,
                        rotation_invariant_pooling)
from ...utils.registry import HEADS
from ..boxes.anchor_generator import AnchorGeneratorRotatedS2ANet
from ..boxes.anchor_target import anchor_target_single
from ..boxes.assigner import MaxIoUAssigner
from ..boxes.coder import DeltaXYWHABBoxCoder
from ..boxes.sampler import PseudoSampler
from ..losses.common import sigmoid_focal_loss, smooth_l1_loss
from ..utils.modules import kaiming_normal_fanout


def bias_init_with_prob(p):
    return float(-np.log((1 - p) / p))


class AlignConv(nn.Module):
    """Anchor-guided deformable alignment (reference :657-723)."""

    feat_channels: int = 256
    kernel_size: int = 3

    @nn.compact
    def __call__(self, x, refine_anchors, stride):
        """x [N, H, W, C]; refine_anchors [N, H, W, 5]."""
        n, h, w, c = x.shape
        k = self.kernel_size
        pad = (k - 1) // 2
        idx = jnp.arange(-pad, pad + 1, dtype=jnp.float32)
        # kernel grid (row-major: y outer, x inner) matching the
        # reference's meshgrid(idx, idx) -> (yy, xx)
        yy = jnp.repeat(idx, k)
        xx = jnp.tile(idx, k)

        xc = jnp.arange(w, dtype=jnp.float32)
        yc = jnp.arange(h, dtype=jnp.float32)
        x_conv = xc[None, :, None] + xx[None, None, :]   # [1, W, K*K]
        y_conv = yc[:, None, None] + yy[None, None, :]   # [H, 1, K*K]

        a = refine_anchors
        ax = a[..., 0] / stride
        ay = a[..., 1] / stride
        aw = a[..., 2] / stride
        ah = a[..., 3] / stride
        aa = a[..., 4]
        cos, sin = jnp.cos(aa), jnp.sin(aa)
        dw = aw / k
        dh = ah / k
        px = dw[..., None] * xx
        py = dh[..., None] * yy
        xr = cos[..., None] * px - sin[..., None] * py
        yr = sin[..., None] * px + cos[..., None] * py
        x_anchor = xr + ax[..., None]                    # [N, H, W, K*K]
        y_anchor = yr + ay[..., None]
        off_x = x_anchor - x_conv[None]
        off_y = y_anchor - y_conv[:, None].reshape(1, h, 1, k * k)
        offset = jnp.stack([off_y, off_x], axis=-1)       # (dy, dx)
        offset = jax.lax.stop_gradient(offset.reshape(n, h, w, -1))

        weight = self.param("kernel", nn.initializers.normal(0.01),
                            (k, k, c, self.feat_channels))
        out = deform_conv2d(x, offset, weight, kernel_size=k,
                            padding=pad)
        return nn.relu(out)


class ORConv2d(nn.Module):
    """Active-rotating-filter conv (reference ``orn.py:620``)."""

    in_channels: int
    out_channels: int          # per-orientation output planes
    n_orientation: int = 1
    n_rotation: int = 8
    kernel_size: int = 3

    @nn.compact
    def __call__(self, x):
        k = self.kernel_size
        cin = self.in_channels // self.n_orientation
        weight = self.param(
            "kernel",
            nn.initializers.normal(
                float(np.sqrt(2.0 / (cin * self.n_orientation * k * k)))),
            (self.out_channels, cin, self.n_orientation * k * k))
        gi = arf_gather_indices(self.n_orientation, self.n_rotation, k)
        rotated = active_rotating_filter(weight, gi)
        # [Cout*nRot, Cin*nOr/k... ] -> HWIO
        cout = self.out_channels * self.n_rotation
        w_oihw = rotated.reshape(cout, cin * self.n_orientation, k, k)
        w_hwio = jnp.transpose(w_oihw, (2, 3, 1, 0))
        bias = self.param("bias", nn.initializers.zeros, (cout,))
        out = jax.lax.conv_general_dilated(
            x, w_hwio, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return out + bias


@HEADS.register_module()
class S2ANetHead(nn.Module):
    num_classes: int = 16          # includes background (JDet convention)
    in_channels: int = 256
    feat_channels: int = 256
    stacked_convs: int = 2
    with_orconv: bool = True
    anchor_scales: Sequence[float] = (4,)
    anchor_ratios: Sequence[float] = (1.0,)
    anchor_strides: Sequence[int] = (8, 16, 32, 64, 128)
    target_means: Sequence[float] = (0.0,) * 5
    target_stds: Sequence[float] = (1.0,) * 5
    # losses
    focal_gamma: float = 2.0
    focal_alpha: float = 0.25
    smooth_l1_beta: float = 1.0 / 9.0
    # test cfg
    nms_pre: int = 2000
    score_thr: float = 0.05
    nms_iou_thr: float = 0.1
    max_per_img: int = 2000
    # train cfg
    pos_iou_thr: float = 0.5
    neg_iou_thr: float = 0.4
    min_pos_iou: float = 0.0

    def setup(self):
        self.cls_out_channels = self.num_classes - 1
        self._coder = DeltaXYWHABBoxCoder(self.target_means,
                                          self.target_stds)
        self._assigner = MaxIoUAssigner(
            pos_iou_thr=self.pos_iou_thr, neg_iou_thr=self.neg_iou_thr,
            min_pos_iou=self.min_pos_iou,
            iou_calculator=dict(type="BboxOverlaps2D_rotated"))
        self._anchor_gens = [
            AnchorGeneratorRotatedS2ANet(s, self.anchor_scales,
                                         self.anchor_ratios)
            for s in self.anchor_strides]

        conv = lambda c, k, name: nn.Conv(
            c, (k, k), padding=k // 2,
            kernel_init=nn.initializers.normal(0.01), name=name)
        self.fam_reg_convs = [conv(self.feat_channels, 3, f"fam_reg_{i}")
                              for i in range(self.stacked_convs)]
        self.fam_cls_convs = [conv(self.feat_channels, 3, f"fam_cls_{i}")
                              for i in range(self.stacked_convs)]
        self.fam_reg = conv(5, 1, "fam_reg_out")
        self.fam_cls = nn.Conv(
            self.cls_out_channels, (1, 1),
            kernel_init=nn.initializers.normal(0.01),
            bias_init=nn.initializers.constant(bias_init_with_prob(0.01)),
            name="fam_cls_out")
        self.align_conv = AlignConv(self.feat_channels, 3)
        if self.with_orconv:
            self.or_conv = ORConv2d(self.feat_channels,
                                    self.feat_channels // 8,
                                    n_orientation=1, n_rotation=8)
        else:
            self.or_conv = conv(self.feat_channels, 3, "or_conv_plain")
        self.odm_reg_convs = [conv(self.feat_channels, 3, f"odm_reg_{i}")
                              for i in range(self.stacked_convs)]
        self.odm_cls_convs = [conv(self.feat_channels, 3, f"odm_cls_{i}")
                              for i in range(self.stacked_convs)]
        self.odm_cls = nn.Conv(
            self.cls_out_channels, (3, 3), padding=1,
            kernel_init=nn.initializers.normal(0.01),
            bias_init=nn.initializers.constant(bias_init_with_prob(0.01)),
            name="odm_cls_out")
        self.odm_reg = conv(5, 3, "odm_reg_out")

    # ------------------------------------------------------------------

    def forward_single(self, x, level: int, train: bool):
        stride = self.anchor_strides[level]
        h, w = x.shape[1:3]
        fam_reg_feat = x
        for c in self.fam_reg_convs:
            fam_reg_feat = nn.relu(c(fam_reg_feat))
        fam_bbox_pred = self.fam_reg(fam_reg_feat)       # [N, H, W, 5]
        fam_cls_score = None
        if train:
            fam_cls_feat = x
            for c in self.fam_cls_convs:
                fam_cls_feat = nn.relu(c(fam_cls_feat))
            fam_cls_score = self.fam_cls(fam_cls_feat)

        anchors = jnp.asarray(
            self._anchor_gens[level].grid_anchors((h, w), stride))
        deltas = jax.lax.stop_gradient(fam_bbox_pred).reshape(
            x.shape[0], -1, 5)
        refined = B.delta2bbox_rotated(
            anchors[None], deltas, self.target_means, self.target_stds,
            wh_ratio_clip=1e-6)                          # [N, H*W, 5]
        refine_anchor = refined.reshape(x.shape[0], h, w, 5)

        align_feat = self.align_conv(x, refine_anchor, stride)
        or_feat = self.or_conv(align_feat)
        odm_reg_feat = or_feat
        odm_cls_feat = (rotation_invariant_pooling(or_feat, 8)
                        if self.with_orconv else or_feat)
        for c in self.odm_reg_convs:
            odm_reg_feat = nn.relu(c(odm_reg_feat))
        for c in self.odm_cls_convs:
            odm_cls_feat = nn.relu(c(odm_cls_feat))
        odm_cls_score = self.odm_cls(odm_cls_feat)
        odm_bbox_pred = self.odm_reg(odm_reg_feat)
        return (fam_cls_score, fam_bbox_pred, refine_anchor,
                odm_cls_score, odm_bbox_pred)

    def __call__(self, feats, train: bool = False):
        outs = [self.forward_single(f, i, train)
                for i, f in enumerate(feats)]
        return tuple(zip(*outs))

    # ------------------------------------------------------------------

    def _targets(self, anchors_per_image, gt_obb, gt_mask, gt_labels):
        """anchor_target over the batch; anchors may be per-image
        ([B, A, 5]) or shared ([A, 5])."""
        b = gt_obb.shape[0]
        if anchors_per_image.ndim == 2:
            anchors_per_image = jnp.broadcast_to(
                anchors_per_image[None],
                (b,) + anchors_per_image.shape)

        def per_image(anchors, obb, mask, labels):
            return anchor_target_single(
                anchors, jnp.ones(anchors.shape[0], bool), obb, mask,
                labels, self._assigner, PseudoSampler(),
                self._coder.encode)

        return jax.vmap(per_image)(anchors_per_image, gt_obb, gt_mask,
                                   gt_labels)

    def loss(self, outs, targets):
        (fam_cls_scores, fam_bbox_preds, refine_anchors,
         odm_cls_scores, odm_bbox_preds) = outs
        gt_obb = targets["rboxes"]
        gt_mask = targets["gt_mask"]
        gt_labels = targets["labels"]
        b = gt_obb.shape[0]

        num_lvl = [f.shape[1] * f.shape[2] for f in fam_bbox_preds]
        init_anchors = jnp.asarray(np.concatenate([
            self._anchor_gens[i].grid_anchors(
                tuple(fam_bbox_preds[i].shape[1:3]),
                self.anchor_strides[i])
            for i in range(len(num_lvl))], 0))
        refined = jnp.concatenate(
            [r.reshape(b, -1, 5) for r in refine_anchors], axis=1)

        losses = {}
        for branch, anchors, cls_scores, bbox_preds in (
                ("fam", init_anchors, fam_cls_scores, fam_bbox_preds),
                ("odm", refined, odm_cls_scores, odm_bbox_preds)):
            res = self._targets(anchors, gt_obb, gt_mask, gt_labels)
            num_total = jnp.maximum(res.num_pos, 1).sum().astype(
                jnp.float32)
            cls = jnp.concatenate(
                [c.reshape(b, -1, self.cls_out_channels)
                 for c in cls_scores], 1)
            reg = jnp.concatenate(
                [r.reshape(b, -1, 5) for r in bbox_preds], 1)
            onehot = jax.nn.one_hot(res.labels - 1,
                                    self.cls_out_channels)
            losses[f"loss_{branch}_cls"] = sigmoid_focal_loss(
                cls.reshape(-1, self.cls_out_channels),
                onehot.reshape(-1, self.cls_out_channels),
                res.label_weights.reshape(-1),
                gamma=self.focal_gamma, alpha=self.focal_alpha,
                avg_factor=num_total)
            losses[f"loss_{branch}_bbox"] = smooth_l1_loss(
                reg.reshape(-1, 5),
                res.bbox_targets.reshape(-1, 5),
                res.bbox_weights.reshape(-1, 5),
                beta=self.smooth_l1_beta, avg_factor=num_total)
        return losses

    # ------------------------------------------------------------------

    def get_bboxes(self, outs, targets):
        (_, _, refine_anchors, odm_cls_scores, odm_bbox_preds) = outs
        b = odm_cls_scores[0].shape[0]
        scale = targets.get("scale_factor", jnp.ones((b,))) \
            if targets else jnp.ones((b,))

        def per_image(args):
            cls_list, reg_list, anchor_list, sf = args
            mlvl_boxes, mlvl_scores = [], []
            for cls, reg, anchors in zip(cls_list, reg_list, anchor_list):
                scores = jax.nn.sigmoid(
                    cls.reshape(-1, self.cls_out_channels))
                deltas = reg.reshape(-1, 5)
                anchors = anchors.reshape(-1, 5)
                k = min(self.nms_pre, scores.shape[0])
                top_s, top_i = fast_top_k(scores.max(1), k)
                mlvl_boxes.append(B.delta2bbox_rotated(
                    anchors[top_i], deltas[top_i], self.target_means,
                    self.target_stds))
                mlvl_scores.append(scores[top_i])
            boxes = jnp.concatenate(mlvl_boxes)
            boxes = boxes.at[:, :4].divide(jnp.maximum(sf, 1e-6))
            scores = jnp.concatenate(mlvl_scores)
            # dummy background column first (sigmoid path convention)
            scores = jnp.concatenate(
                [jnp.zeros((scores.shape[0], 1)), scores], axis=1)
            dets, labels, valid = multiclass_nms_rotated_jit(
                boxes, scores, self.score_thr, self.nms_iou_thr,
                pre_nms=min(2000, scores.shape[0] * self.cls_out_channels),
                max_num=self.max_per_img)
            polys = B.rotated_box_to_poly(dets[:, :5], best_begin=False)
            return polys, dets[:, 5], labels, valid

        results = []
        for i in range(b):
            cls_list = [c[i] for c in odm_cls_scores]
            reg_list = [r[i] for r in odm_bbox_preds]
            anchor_list = [a[i] for a in refine_anchors]
            results.append(per_image((cls_list, reg_list, anchor_list,
                                      scale[i])))
        return dict(
            polys=jnp.stack([r[0] for r in results]),
            scores=jnp.stack([r[1] for r in results]),
            labels=jnp.stack([r[2] for r in results]),
            valid=jnp.stack([r[3] for r in results]))
