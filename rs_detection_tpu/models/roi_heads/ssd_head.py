"""SSD multibox head (horizontal boxes).

Capability parity with the reference ``SSDHead``
(``python/jdet/models/roi_heads/ssd_head.py``, 390 LoC): per-level
3x3 cls/reg convs over the SSD anchor set, softmax CE with 3:1 online
hard negative mining, SmoothL1 regression, hbb NMS inference.

TPU-first: hard-negative mining = top-k over per-anchor CE losses
instead of sort-and-slice; everything dense/masked.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ...ops import box_ops as B
from ...ops.nms import _greedy_suppress, bbox_overlaps_hbb
from ...utils.registry import HEADS
from ..boxes.anchor_generator import SSDAnchorGenerator
from ..boxes.anchor_target import anchor_target_single
from ..boxes.assigner import MaxIoUAssigner
from ..boxes.coder import DeltaXYWHBBoxCoder
from ..boxes.sampler import PseudoSampler
from ..losses.common import smooth_l1_loss


@HEADS.register_module()
class SSDHead(nn.Module):
    num_classes: int = 81            # includes background at 0
    in_channels: Sequence[int] = (512, 1024, 512, 256, 256, 256)
    anchor_strides: Sequence[int] = (8, 16, 32, 64, 100, 300)
    basesize_ratio_range: Sequence[float] = (0.15, 0.9)
    anchor_ratios: Sequence[Sequence[float]] = (
        (2,), (2, 3), (2, 3), (2, 3), (2,), (2,))
    input_size: int = 300
    target_means: Sequence[float] = (0.0,) * 4
    target_stds: Sequence[float] = (0.1, 0.1, 0.2, 0.2)
    neg_pos_ratio: int = 3
    nms_pre: int = 1000
    score_thr: float = 0.02
    nms_iou_thr: float = 0.45
    max_per_img: int = 200

    def setup(self):
        self._anchor_gen = SSDAnchorGenerator(
            strides=list(self.anchor_strides),
            ratios=[list(r) for r in self.anchor_ratios],
            basesize_ratio_range=tuple(self.basesize_ratio_range),
            input_size=self.input_size)
        self._coder = DeltaXYWHBBoxCoder(self.target_means,
                                         self.target_stds)
        self._assigner = MaxIoUAssigner(pos_iou_thr=0.5,
                                        neg_iou_thr=0.5,
                                        min_pos_iou=0.0,
                                        match_low_quality=True)
        self.cls_convs = [
            nn.Conv(n * self.num_classes, (3, 3), padding=1,
                    kernel_init=nn.initializers.normal(0.01),
                    name=f"cls_{i}")
            for i, n in enumerate(self._anchor_gen.num_base_anchors)]
        self.reg_convs = [
            nn.Conv(n * 4, (3, 3), padding=1,
                    kernel_init=nn.initializers.normal(0.01),
                    name=f"reg_{i}")
            for i, n in enumerate(self._anchor_gen.num_base_anchors)]

    def __call__(self, feats, train: bool = False):
        cls_scores = [c(f) for c, f in zip(self.cls_convs, feats)]
        bbox_preds = [r(f) for r, f in zip(self.reg_convs, feats)]
        return cls_scores, bbox_preds

    def _anchors(self, featmap_sizes):
        return jnp.asarray(np.concatenate(
            self._anchor_gen.grid_anchors(featmap_sizes), 0))

    def loss(self, outs, targets):
        cls_scores, bbox_preds = outs
        b = cls_scores[0].shape[0]
        featmap_sizes = [tuple(c.shape[1:3]) for c in cls_scores]
        anchors = self._anchors(featmap_sizes)

        def per_image(hbb, mask, labels):
            return anchor_target_single(
                anchors, jnp.ones(anchors.shape[0], bool), hbb, mask,
                labels, self._assigner, PseudoSampler(),
                self._coder.encode)

        res = jax.vmap(per_image)(targets["hboxes"], targets["gt_mask"],
                                  targets["labels"])
        cls = jnp.concatenate(
            [c.reshape(b, -1, self.num_classes) for c in cls_scores], 1)
        reg = jnp.concatenate(
            [r.reshape(b, -1, 4) for r in bbox_preds], 1)

        labels = res.labels
        pos = labels > 0
        num_pos = jnp.maximum(pos.sum(), 1).astype(jnp.float32)
        logp = jax.nn.log_softmax(cls, axis=-1)
        ce = -jnp.take_along_axis(logp, labels[..., None], -1)[..., 0]
        # online hard negative mining: top (3 * num_pos) negative losses
        neg_ce = jnp.where(pos | (res.label_weights == 0), -jnp.inf, ce)
        flat = neg_ce.reshape(-1)
        k = flat.shape[0]
        order = jnp.argsort(-flat)
        rank = jnp.zeros((k,), jnp.int32).at[order].set(
            jnp.arange(k, dtype=jnp.int32))
        budget = (self.neg_pos_ratio * num_pos).astype(jnp.int32)
        neg_sel = (rank < budget).reshape(ce.shape) & jnp.isfinite(
            neg_ce)
        loss_cls = (jnp.where(pos, ce, 0.0).sum()
                    + jnp.where(neg_sel, ce, 0.0).sum()) / num_pos
        loss_bbox = smooth_l1_loss(reg, res.bbox_targets,
                                   res.bbox_weights, beta=1.0,
                                   avg_factor=num_pos)
        return dict(loss_cls=loss_cls, loss_bbox=loss_bbox)

    def get_bboxes(self, outs, targets):
        cls_scores, bbox_preds = outs
        b = cls_scores[0].shape[0]
        featmap_sizes = [tuple(c.shape[1:3]) for c in cls_scores]
        anchors = self._anchors(featmap_sizes)
        results = []
        for i in range(b):
            cls = jnp.concatenate(
                [c[i].reshape(-1, self.num_classes)
                 for c in cls_scores], 0)
            reg = jnp.concatenate(
                [r[i].reshape(-1, 4) for r in bbox_preds], 0)
            scores = jax.nn.softmax(cls, -1)[:, 1:]   # drop background
            k = min(self.nms_pre, scores.shape[0])
            top_s, top_i = jax.lax.top_k(scores.max(1), k)
            boxes = B.delta2bbox(anchors[top_i], reg[top_i],
                                 self.target_means, self.target_stds)
            sc = scores[top_i]
            lab = sc.argmax(1)
            best = sc.max(1)
            ok = best > self.score_thr
            order = jnp.argsort(-jnp.where(ok, best, -jnp.inf))
            iou = bbox_overlaps_hbb(boxes[order], boxes[order])
            same = lab[order][:, None] == lab[order][None, :]
            keep_sorted = _greedy_suppress(
                jnp.where(same, iou, 0.0), ok[order], self.nms_iou_thr)
            keep = jnp.zeros_like(ok).at[order].set(keep_sorted)
            kept = jnp.where(keep, best, -jnp.inf)
            out_s, sel = jax.lax.top_k(kept, min(self.max_per_img, k))
            valid = jnp.isfinite(out_s)
            hbb = boxes[sel]
            polys = B.hbb2poly(hbb)
            results.append((polys, jnp.where(valid, out_s, 0.0),
                            jnp.where(valid, lab[sel] + 1, -1), valid))
        return dict(
            polys=jnp.stack([r[0] for r in results]),
            scores=jnp.stack([r[1] for r in results]),
            labels=jnp.stack([r[2] for r in results]),
            valid=jnp.stack([r[3] for r in results]))


from ..networks.single_stage import SingleStageDetector  # noqa: E402
from ...utils.registry import MODELS  # noqa: E402


@MODELS.register_module()
class SSD(SingleStageDetector):
    """Reference ``networks`` SSD path."""
