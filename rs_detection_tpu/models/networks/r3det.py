"""R3Det: refined single-stage rotated detector.

Capability parity with the reference ``R3Det``
(``python/jdet/models/networks/r3det.py:6``, 159 LoC): a RetinaNet-like
first stage proposes rotated boxes per location; the
``FeatureRefineModule`` (``ops/fr.py:291-348``) re-samples features at
the refined box centers (1x5 + 5x1 + 1x1 conv mix, then the FR gather);
a refinement head regresses against the refined anchors (S2ANet-ODM
style targeting on refined boxes).
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ...ops import box_ops as B
from ...ops.fr import feature_refine
from ...utils.registry import BACKBONES, HEADS, MODELS, NECKS
from ..boxes.anchor_target import anchor_target_single
from ..boxes.assigner import MaxIoUAssigner
from ..boxes.coder import DeltaXYWHABBoxCoder
from ..boxes.sampler import PseudoSampler
from ..losses.common import sigmoid_focal_loss, smooth_l1_loss
from ..roi_heads.retina_head import RetinaHead
from .rcnn import _build
from .single_stage import SingleStageDetector


class FeatureRefineModule(nn.Module):
    """Reference ``ops/fr.py:291-348``: conv_1_5 -> conv_5_1 mixing +
    conv_1_1, then the FR bilinear gather at refined-box points."""

    in_channels: int = 256
    featmap_strides: Sequence[int] = (8, 16, 32, 64, 128)
    points: int = 1

    @nn.compact
    def __call__(self, feats, best_rbboxes):
        outs = []
        for i, (x, boxes) in enumerate(zip(feats, best_rbboxes)):
            f1 = nn.Conv(self.in_channels, (1, 5), padding=(0, 2),
                         kernel_init=nn.initializers.normal(0.01),
                         name=f"conv_1_5_{i}")(x)
            f1 = nn.Conv(self.in_channels, (5, 1), padding=(2, 0),
                         kernel_init=nn.initializers.normal(0.01),
                         name=f"conv_5_1_{i}")(f1)
            f2 = nn.Conv(self.in_channels, (1, 1),
                         kernel_init=nn.initializers.normal(0.01),
                         name=f"conv_1_1_{i}")(x)
            mixed = f1 + f2
            refined = feature_refine(
                mixed, boxes, 1.0 / self.featmap_strides[i],
                points=self.points)
            outs.append(x + (refined - mixed))  # residual add of gather
        return outs


@HEADS.register_module()
class R3DetRefineHead(nn.Module):
    """Refinement stage: 5-dim reg + sigmoid cls on refined anchors."""

    num_classes: int = 16
    in_channels: int = 256
    feat_channels: int = 256
    stacked_convs: int = 2
    target_stds: Sequence[float] = (1.0,) * 5

    def setup(self):
        self.cls_out_channels = self.num_classes - 1
        conv = lambda c, name: nn.Conv(
            c, (3, 3), padding=1,
            kernel_init=nn.initializers.normal(0.01), name=name)
        self.cls_convs = [conv(self.feat_channels, f"cls_{i}")
                          for i in range(self.stacked_convs)]
        self.reg_convs = [conv(self.feat_channels, f"reg_{i}")
                          for i in range(self.stacked_convs)]
        self.out_cls = nn.Conv(
            self.cls_out_channels, (3, 3), padding=1,
            kernel_init=nn.initializers.normal(0.01),
            bias_init=nn.initializers.constant(float(-np.log(99.0))),
            name="out_cls")
        self.out_reg = conv(5, "out_reg")
        self._coder = DeltaXYWHABBoxCoder(target_stds=self.target_stds)
        self._assigner = MaxIoUAssigner(
            pos_iou_thr=0.6, neg_iou_thr=0.5, min_pos_iou=0.0,
            iou_calculator=dict(type="BboxOverlaps2D_rotated"))

    def __call__(self, feats):
        cls_scores, bbox_preds = [], []
        for f in feats:
            c, r = f, f
            for conv in self.cls_convs:
                c = nn.relu(conv(c))
            for conv in self.reg_convs:
                r = nn.relu(conv(r))
            cls_scores.append(self.out_cls(c))
            bbox_preds.append(self.out_reg(r))
        return cls_scores, bbox_preds

    def loss(self, cls_scores, bbox_preds, refined_anchors, targets):
        b = cls_scores[0].shape[0]
        anchors = jnp.concatenate(
            [a.reshape(b, -1, 5) for a in refined_anchors], 1)

        def per_image(a, obb, mask, labels):
            return anchor_target_single(
                a, jnp.ones(a.shape[0], bool), obb, mask, labels,
                self._assigner, PseudoSampler(), self._coder.encode)

        res = jax.vmap(per_image)(anchors, targets["rboxes"],
                                  targets["gt_mask"], targets["labels"])
        num_total = jnp.maximum(res.num_pos, 1).sum().astype(jnp.float32)
        cls = jnp.concatenate(
            [c.reshape(b, -1, self.cls_out_channels)
             for c in cls_scores], 1)
        reg = jnp.concatenate(
            [r.reshape(b, -1, 5) for r in bbox_preds], 1)
        onehot = jax.nn.one_hot(res.labels - 1, self.cls_out_channels)
        return dict(
            loss_refine_cls=sigmoid_focal_loss(
                cls.reshape(-1, self.cls_out_channels),
                onehot.reshape(-1, self.cls_out_channels),
                res.label_weights.reshape(-1), avg_factor=num_total),
            loss_refine_bbox=smooth_l1_loss(
                reg.reshape(-1, 5), res.bbox_targets.reshape(-1, 5),
                res.bbox_weights.reshape(-1, 5), beta=1.0 / 9.0,
                avg_factor=num_total))


@MODELS.register_module()
class R3Det(SingleStageDetector):
    refine_head: Any = None
    frm: Any = None
    # reference r3det config schema (projects/r3det/configs): a list of
    # refine-head cfgs + per-stage FRM cfgs + an explicit stage count.
    # This implementation runs one refine stage; the first entry of
    # each list configures it.
    refine_heads: Any = None
    frm_cfgs: Any = None
    num_refine_stages: Any = None

    def _refine_cfg(self):
        if self.refine_head is not None:
            return self.refine_head
        if self.refine_heads:
            from .compat import adapt_refine_head

            return adapt_refine_head(list(self.refine_heads)[0])
        return None

    def setup(self):
        from ..backbones.resnet import ResNet
        from ..necks.fpn import FPN

        self._backbone = _build(self.backbone, BACKBONES,
                                lambda: ResNet(depth=50))
        self._neck = _build(
            self.neck, NECKS,
            lambda: FPN(in_channels=(256, 512, 1024, 2048),
                        out_channels=256, num_outs=5,
                        add_extra_convs="on_input"))
        self._bbox_head = _build(self._head_cfg(), HEADS,
                                 lambda: RetinaHead())
        self._refine_head = _build(self._refine_cfg(), HEADS,
                                   lambda: R3DetRefineHead(
                                       num_classes=self
                                       ._bbox_head.num_classes,
                                       in_channels=self
                                       ._bbox_head.feat_channels,
                                       feat_channels=self
                                       ._bbox_head.feat_channels))
        frm_cfg = self.frm
        if frm_cfg is None and self.frm_cfgs:
            first = dict(list(self.frm_cfgs)[0])
            frm_cfg = FeatureRefineModule(
                in_channels=first.get("in_channels", 256),
                featmap_strides=tuple(first.get(
                    "featmap_strides",
                    self._bbox_head.anchor_strides)))
        self._frm = (frm_cfg if frm_cfg is not None
                     else FeatureRefineModule(
                         in_channels=self._bbox_head.feat_channels,
                         featmap_strides=self._bbox_head.anchor_strides))

    def _refined_anchors(self, bbox_preds):
        """Decode stage-1 regressions against the per-level anchors to
        get per-cell best rboxes (max-score anchor per cell reduced to
        the single-anchor case: anchor 0)."""
        head = self._bbox_head
        outs = []
        for lvl, reg in enumerate(bbox_preds):
            b, h, w, _ = reg.shape
            na = head.num_anchors
            anchors = jnp.asarray(head._anchor_gens[lvl].grid_anchors(
                (h, w), head.anchor_strides[lvl]))
            deltas = reg.reshape(b, h * w * na, 5)
            decoded = B.delta2bbox_rotated(
                anchors[None], jax.lax.stop_gradient(deltas),
                head.target_means, head.target_stds)
            # per-cell representative: first anchor's refinement
            decoded = decoded.reshape(b, h, w, na, 5)[:, :, :, 0]
            outs.append(decoded)
        return outs

    def __call__(self, images, targets=None, train: bool = False):
        feats = self.extract_feats(images, train=False)
        outs = self._bbox_head(feats, train=True)
        refined = self._refined_anchors(outs[1])
        rfeats = self._frm(feats, refined)
        self._refine_head(rfeats)
        return self._bbox_head.get_bboxes(outs, targets or {})

    def loss(self, images, targets):
        feats = self.extract_feats(images, train=True)
        outs = self._bbox_head(feats, train=True)
        losses = self._bbox_head.loss(outs, targets)
        refined = self._refined_anchors(outs[1])
        rfeats = self._frm(feats, refined)
        r_cls, r_reg = self._refine_head(rfeats)
        b = images.shape[0]
        refined_flat = [r.reshape(b, -1, 5) for r in refined]
        losses.update(self._refine_head.loss(r_cls, r_reg, refined_flat,
                                             targets))
        return losses

    def predict(self, images, targets=None):
        feats = self.extract_feats(images, train=False)
        outs = self._bbox_head(feats, train=False)
        refined = self._refined_anchors(outs[1])
        rfeats = self._frm(feats, refined)
        r_cls, r_reg = self._refine_head(rfeats)
        # decode refinement against refined anchors via the retina path
        head = self._bbox_head
        # reuse RetinaHead.get_bboxes on refined predictions by
        # substituting anchors with the refined boxes
        b = images.shape[0]
        results = []
        coder_means = (0.0,) * 5
        coder_stds = self._refine_head.target_stds
        from ...ops.nms_rotated import multiclass_nms_rotated_jit
        scale = (targets or {}).get("scale_factor",
                                    jnp.ones((b,))) if targets \
            else jnp.ones((b,))
        for i in range(b):
            mlvl_boxes, mlvl_scores = [], []
            for lvl in range(len(r_cls)):
                scores = jax.nn.sigmoid(r_cls[lvl][i].reshape(
                    -1, head.num_classes - 1))
                deltas = r_reg[lvl][i].reshape(-1, 5)
                anchors = refined[lvl][i].reshape(-1, 5)
                k = min(head.nms_pre, scores.shape[0])
                _, top_i = jax.lax.top_k(scores.max(1), k)
                mlvl_boxes.append(B.delta2bbox_rotated(
                    anchors[top_i], deltas[top_i], coder_means,
                    tuple(coder_stds)))
                mlvl_scores.append(scores[top_i])
            boxes = jnp.concatenate(mlvl_boxes)
            boxes = boxes.at[:, :4].divide(jnp.maximum(scale[i], 1e-6))
            scores = jnp.concatenate(mlvl_scores)
            scores = jnp.concatenate(
                [jnp.zeros((scores.shape[0], 1)), scores], 1)
            dets, labels, valid = multiclass_nms_rotated_jit(
                boxes, scores, head.score_thr, head.nms_iou_thr,
                pre_nms=min(2000,
                            scores.shape[0] * (head.num_classes - 1)),
                max_num=head.max_per_img)
            polys = B.rotated_box_to_poly(dets[:, :5], best_begin=False)
            results.append((polys, dets[:, 5], labels, valid))
        return dict(
            polys=jnp.stack([r[0] for r in results]),
            scores=jnp.stack([r[1] for r in results]),
            labels=jnp.stack([r[2] for r in results]),
            valid=jnp.stack([r[3] for r in results]))
