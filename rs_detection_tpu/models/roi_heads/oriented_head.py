"""Oriented R-CNN second stage (rotated RoI head).

Capability parity with the reference ``OrientedHead``
(``python/jdet/models/roi_heads/oriented_head.py:48-623``): per-image
assignment with rotated IoU (v1), random 512-sampling with
``add_gt_as_proposals``, rotated RoIAlign over the level-routed
extractor, 2 shared FCs, softmax cls (C+1, bg last) + class-agnostic
5-dim ``OrientedDeltaXYWHTCoder`` regression; CE + SmoothL1 losses; at
test time decode + rescale + score threshold only (per-tile NMS is
deliberately deferred to the tile-merge step — SURVEY §3.2).

TPU-first: sampling produces a fixed 512-slot roi set per image
(positives first via priority top-k), targets are computed densely and
gathered — no dynamic shapes anywhere. The angle sign flip at the
OBB-path boundary (reference ``oriented_head.py:551-558``) happens
here.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...ops import box_ops as B
from ...utils.registry import HEADS
from ..boxes.assigner import MaxIoUAssigner
from ..boxes.coder import OrientedDeltaXYWHTCoder
from ..boxes.sampler import RandomSampler
from ..losses.common import smooth_l1_loss, softmax_cross_entropy
from ..roi_extractors.oriented_single_level import OrientedSingleRoIExtractor


@HEADS.register_module()
class OrientedHead(nn.Module):
    num_classes: int = 15
    in_channels: int = 256
    fc_out_channels: int = 1024
    num_shared_fcs: int = 2
    score_thresh: float = 0.05
    reg_class_agnostic: bool = True
    pos_weight: float = -1.0
    assigner: Any = None
    sampler: Any = None
    bbox_coder: Any = None
    bbox_roi_extractor: Any = None

    def setup(self):
        asn = self.assigner or dict(
            pos_iou_thr=0.5, neg_iou_thr=0.5, min_pos_iou=0.5,
            match_low_quality=False,
            iou_calculator=dict(type="BboxOverlaps2D_rotated_v1"))
        asn = {k: v for k, v in dict(asn).items() if k != "type"}
        asn.pop("assigned_labels_filled", None)
        self._assigner = MaxIoUAssigner(**asn)
        smp = self.sampler or dict(num=512, pos_fraction=0.25,
                                   add_gt_as_proposals=True)
        smp = {k: v for k, v in dict(smp).items() if k != "type"}
        self._sampler = RandomSampler(**smp)
        bc = self.bbox_coder or dict(
            target_means=[0., 0., 0., 0., 0.],
            target_stds=[0.1, 0.1, 0.2, 0.2, 0.1])
        bc = {k: v for k, v in dict(bc).items() if k != "type"}
        self._coder = OrientedDeltaXYWHTCoder(**bc)
        ex = self.bbox_roi_extractor or dict(
            roi_layer=dict(output_size=7, sampling_ratio=2),
            out_channels=256, extend_factor=(1.4, 1.2),
            featmap_strides=[4, 8, 16, 32])
        ex = {k: v for k, v in dict(ex).items() if k != "type"}
        if "roi_layer" in ex:
            ex["roi_layer"] = {k: v for k, v in dict(ex["roi_layer"]).items()
                               if k != "type"}
        self._extractor = OrientedSingleRoIExtractor(**ex)
        self.reg_dim = 5

        self.shared_fcs = [nn.Dense(self.fc_out_channels,
                                    kernel_init=nn.initializers
                                    .xavier_uniform(),
                                    name=f"shared_fc{i}")
                           for i in range(self.num_shared_fcs)]
        self.fc_cls = nn.Dense(self.num_classes + 1,
                               kernel_init=nn.initializers.normal(0.01))
        out_reg = (self.reg_dim if self.reg_class_agnostic
                   else self.reg_dim * self.num_classes)
        self.fc_reg = nn.Dense(out_reg,
                               kernel_init=nn.initializers.normal(0.001))

    def forward_rois(self, feats: Sequence[jnp.ndarray], rois: jnp.ndarray,
                     training: bool = False):
        """rois [R, 6] -> (cls_score [R, C+1], bbox_pred [R, reg])."""
        x = self._extractor(feats, rois, training=training)  # [R,P,P,C]
        x = x.reshape(x.shape[0], -1)
        for fc in self.shared_fcs:
            x = nn.relu(fc(x))
        return (self.fc_cls(x).astype(jnp.float32),
                self.fc_reg(x).astype(jnp.float32))

    # ---------------- training ----------------

    def sample_rois(self, proposals, prop_valid, gt_obb, gt_mask,
                    gt_labels0, key):
        """Per-image: assign + sample a fixed set of ``num`` rois.

        Args:
          proposals: [P, 5] obb proposals (OBB convention).
          prop_valid: [P] bool.
          gt_obb: [G, 5] (OBB convention, i.e. already angle-flipped).
          gt_labels0: [G] 0-based class labels.

        Returns dict with rois [S, 5], labels [S] (bg=num_classes),
        label_weights [S], bbox_targets [S, 5], bbox_weights [S, 5].
        """
        num = self._sampler.num
        if self._sampler.add_gt_as_proposals:
            cand = jnp.concatenate([proposals, gt_obb], 0)
            cand_valid = jnp.concatenate([prop_valid, gt_mask], 0)
        else:
            cand = proposals
            cand_valid = prop_valid

        assigned, _ = self._assigner.assign(
            cand, gt_obb, gt_mask, anchor_mask=cand_valid)
        pos_mask, neg_mask = self._sampler.sample(assigned, key)

        # fixed-slot selection: positives first, then negatives
        priority = (pos_mask.astype(jnp.float32) * 2.0
                    + neg_mask.astype(jnp.float32))
        # deterministic tiebreak by index to keep selection stable
        priority = priority - jnp.arange(cand.shape[0]) * 1e-9
        _, sel = jax.lax.top_k(priority, num)
        sel_pos = pos_mask[sel]
        sel_neg = neg_mask[sel]
        sel_rois = cand[sel]
        matched = jnp.clip(assigned[sel] - 1, 0, gt_obb.shape[0] - 1)
        matched_gts = gt_obb[matched]
        targets = self._coder.encode(sel_rois, matched_gts)

        labels = jnp.where(sel_pos, gt_labels0[matched], self.num_classes)
        pw = 1.0 if self.pos_weight <= 0 else self.pos_weight
        label_weights = jnp.where(sel_pos, pw,
                                  jnp.where(sel_neg, 1.0, 0.0))
        bbox_weights = jnp.where(sel_pos[:, None],
                                 jnp.ones((1, self.reg_dim)), 0.0)
        return dict(rois=sel_rois,
                    labels=labels.astype(jnp.int32),
                    label_weights=label_weights.astype(jnp.float32),
                    bbox_targets=jnp.where(sel_pos[:, None], targets, 0.0),
                    bbox_weights=bbox_weights.astype(jnp.float32))

    def loss(self, feats, proposals, prop_valid, targets, rng):
        """Batched training loss.

        Args:
          proposals: [B, P, 5]; targets dict with "rboxes" [B, G, 5]
            (data convention), "labels" [B, G] (1-based), "gt_mask".
        """
        b = proposals.shape[0]
        gt_obb = targets["rboxes"].at[..., 4].multiply(-1.0)
        gt_labels0 = jnp.maximum(targets["labels"] - 1, 0)
        keys = jax.random.split(rng, b)
        sampled = jax.vmap(self.sample_rois)(
            proposals, prop_valid, gt_obb, targets["gt_mask"],
            gt_labels0, keys)

        # build [B*S, 6] rois with batch index column
        s = sampled["rois"].shape[1]
        batch_idx = jnp.repeat(jnp.arange(b, dtype=jnp.float32), s)
        rois = jnp.concatenate(
            [batch_idx[:, None], sampled["rois"].reshape(b * s, 5)], 1)
        cls_score, bbox_pred = self.forward_rois(feats, rois,
                                                 training=True)

        labels = sampled["labels"].reshape(-1)
        label_weights = sampled["label_weights"].reshape(-1)
        bbox_targets = sampled["bbox_targets"].reshape(-1, self.reg_dim)
        bbox_weights = sampled["bbox_weights"].reshape(-1, self.reg_dim)

        cls_avg = jnp.maximum((label_weights > 0).sum(), 1.0)
        loss_cls = softmax_cross_entropy(cls_score, labels, label_weights,
                                         avg_factor=cls_avg)
        if not self.reg_class_agnostic:
            bp = bbox_pred.reshape(-1, self.num_classes, self.reg_dim)
            safe = jnp.clip(labels, 0, self.num_classes - 1)
            bbox_pred = jnp.take_along_axis(
                bp, safe[:, None, None].repeat(self.reg_dim, -1), 1)[:, 0]
        # reference avg: total sampled rois (oriented_head.py:404-417)
        loss_bbox = smooth_l1_loss(bbox_pred, bbox_targets, bbox_weights,
                                   beta=1.0, avg_factor=float(b * s))
        return dict(loss_cls=loss_cls, orcnn_bbox_loss=loss_bbox)

    # ---------------- inference ----------------

    def predict(self, feats, proposals, prop_valid, scale_factor):
        """Batched inference.

        Returns dict: polys [B, P, 8] (JDet image-frame convention),
        scores [B, P, C] (softmax, background dropped), valid [B, P].
        Per-tile NMS is intentionally not applied (deferred to merge).
        """
        b, p, _ = proposals.shape
        batch_idx = jnp.repeat(jnp.arange(b, dtype=jnp.float32), p)
        rois = jnp.concatenate(
            [batch_idx[:, None], proposals.reshape(b * p, 5)], 1)
        cls_score, bbox_pred = self.forward_rois(feats, rois)
        scores = jax.nn.softmax(cls_score, axis=-1)[:, :-1]  # drop bg
        obbs = self._coder.decode(rois[:, 1:], bbox_pred)
        # rescale to original image coordinates
        sf = jnp.repeat(scale_factor, p)[:, None]
        obbs = obbs.at[:, :4].divide(jnp.maximum(sf, 1e-6))
        polys = B.obb2poly(obbs)
        return dict(polys=polys.reshape(b, p, 8),
                    scores=scores.reshape(b, p, self.num_classes),
                    valid=prop_valid)
