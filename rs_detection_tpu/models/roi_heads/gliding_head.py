"""Gliding Vertex second-stage head.

Capability parity with the reference ``GlidingHead``
(``python/jdet/models/roi_heads/gliding_head.py:10-456``): horizontal
RoIAlign over FPN levels, 2 shared FCs, then 4 predictions — softmax
cls (C+1), hbb delta (4), per-edge glide "fix" ratios (4, sigmoid),
obb/hbb area ratio (1, sigmoid); decode glides the hbb's edges into the
quad and falls back to the hbb when the area ratio exceeds
``ratio_thr`` (0.8). Losses: CE + SmoothL1 (bbox) + SmoothL1 (fix) +
SmoothL1 (ratio).

Static-shape sampling identical to ``OrientedHead.sample_rois``.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...ops import box_ops as B
from ...utils.registry import HEADS
from ..boxes.assigner import MaxIoUAssigner
from ..boxes.coder import GVDeltaXYWHBBoxCoder, GVFixCoder, GVRatioCoder
from ..boxes.sampler import RandomSampler
from ..losses.common import smooth_l1_loss, softmax_cross_entropy
from ..roi_extractors.oriented_single_level import SingleRoIExtractor


@HEADS.register_module()
class GlidingHead(nn.Module):
    num_classes: int = 15
    in_channels: int = 256
    fc_out_channels: int = 1024
    num_shared_fcs: int = 2
    score_thresh: float = 0.05
    ratio_thr: float = 0.8
    pos_weight: float = -1.0
    assigner: Any = None
    sampler: Any = None
    bbox_coder: Any = None
    bbox_roi_extractor: Any = None

    def setup(self):
        asn = self.assigner or dict(pos_iou_thr=0.5, neg_iou_thr=0.5,
                                    min_pos_iou=0.5,
                                    match_low_quality=False)
        asn = {k: v for k, v in dict(asn).items()
               if k not in ("type", "assigned_labels_filled",
                            "iou_calculator", "ignore_iof_thr")}
        self._assigner = MaxIoUAssigner(**asn)
        smp = self.sampler or dict(num=512, pos_fraction=0.25,
                                   add_gt_as_proposals=True)
        smp = {k: v for k, v in dict(smp).items() if k != "type"}
        self._sampler = RandomSampler(**smp)
        bc = self.bbox_coder or dict(
            target_means=(0., 0., 0., 0.),
            target_stds=(0.1, 0.1, 0.2, 0.2))
        bc = {k: v for k, v in dict(bc).items() if k != "type"}
        self._coder = GVDeltaXYWHBBoxCoder(**bc)
        self._fix_coder = GVFixCoder()
        self._ratio_coder = GVRatioCoder()
        ex = self.bbox_roi_extractor or dict(
            roi_layer=dict(output_size=7, sampling_ratio=2),
            out_channels=256, featmap_strides=[4, 8, 16, 32])
        ex = {k: v for k, v in dict(ex).items()
              if k not in ("type", "extend_factor")}
        if "roi_layer" in ex:
            ex["roi_layer"] = {k: v for k, v in
                               dict(ex["roi_layer"]).items()
                               if k != "type"}
        self._extractor = SingleRoIExtractor(**ex)

        self.shared_fcs = [nn.Dense(self.fc_out_channels,
                                    kernel_init=nn.initializers
                                    .xavier_uniform(),
                                    name=f"shared_fc{i}")
                           for i in range(self.num_shared_fcs)]
        self.fc_cls = nn.Dense(self.num_classes + 1,
                               kernel_init=nn.initializers.normal(0.01))
        self.fc_reg = nn.Dense(4,
                               kernel_init=nn.initializers.normal(0.001))
        self.fc_fix = nn.Dense(4,
                               kernel_init=nn.initializers.normal(0.001))
        self.fc_ratio = nn.Dense(1,
                                 kernel_init=nn.initializers
                                 .normal(0.001))

    def forward_rois(self, feats, rois):
        x = self._extractor(feats, rois)
        x = x.reshape(x.shape[0], -1)
        for fc in self.shared_fcs:
            x = nn.relu(fc(x))
        return (self.fc_cls(x), self.fc_reg(x),
                jax.nn.sigmoid(self.fc_fix(x)),
                jax.nn.sigmoid(self.fc_ratio(x)))

    # ------------------------------------------------------------------

    def sample_rois(self, proposals, prop_valid, gt_hbb, gt_poly,
                    gt_mask, gt_labels0, key):
        num = self._sampler.num
        if self._sampler.add_gt_as_proposals:
            cand = jnp.concatenate([proposals, gt_hbb], 0)
            cand_valid = jnp.concatenate([prop_valid, gt_mask], 0)
        else:
            cand, cand_valid = proposals, prop_valid
        assigned, _ = self._assigner.assign(cand, gt_hbb, gt_mask,
                                            anchor_mask=cand_valid)
        pos_mask, neg_mask = self._sampler.sample(assigned, key)
        priority = (pos_mask.astype(jnp.float32) * 2.0
                    + neg_mask.astype(jnp.float32))
        priority = priority - jnp.arange(cand.shape[0]) * 1e-9
        _, sel = jax.lax.top_k(priority, num)
        sel_pos = pos_mask[sel]
        sel_neg = neg_mask[sel]
        sel_rois = cand[sel]
        matched = jnp.clip(assigned[sel] - 1, 0, gt_hbb.shape[0] - 1)
        bbox_t = self._coder.encode(sel_rois, gt_hbb[matched])
        fix_t = self._fix_coder.encode(gt_poly[matched])
        ratio_t = self._ratio_coder.encode(gt_poly[matched])
        labels = jnp.where(sel_pos, gt_labels0[matched],
                           self.num_classes)
        pw = 1.0 if self.pos_weight <= 0 else self.pos_weight
        lw = jnp.where(sel_pos, pw, jnp.where(sel_neg, 1.0, 0.0))
        return dict(rois=sel_rois, labels=labels.astype(jnp.int32),
                    label_weights=lw.astype(jnp.float32),
                    bbox_targets=jnp.where(sel_pos[:, None], bbox_t, 0),
                    fix_targets=jnp.where(sel_pos[:, None], fix_t, 0),
                    ratio_targets=jnp.where(sel_pos[:, None], ratio_t, 0),
                    pos=sel_pos)

    def loss(self, feats, proposals, prop_valid, targets, rng):
        b = proposals.shape[0]
        gt_labels0 = jnp.maximum(targets["labels"] - 1, 0)
        keys = jax.random.split(rng, b)
        sampled = jax.vmap(self.sample_rois)(
            proposals, prop_valid, targets["hboxes"], targets["polys"],
            targets["gt_mask"], gt_labels0, keys)
        s = sampled["rois"].shape[1]
        batch_idx = jnp.repeat(jnp.arange(b, dtype=jnp.float32), s)
        rois = jnp.concatenate(
            [batch_idx[:, None], sampled["rois"].reshape(b * s, 4)], 1)
        cls_score, bbox_pred, fix_pred, ratio_pred = self.forward_rois(
            feats, rois)

        labels = sampled["labels"].reshape(-1)
        lw = sampled["label_weights"].reshape(-1)
        pos = sampled["pos"].reshape(-1)
        posf = pos.astype(jnp.float32)
        cls_avg = jnp.maximum((lw > 0).sum(), 1.0)
        n_samp = float(b * s)
        losses = dict(
            gliding_cls_loss=softmax_cross_entropy(
                cls_score, labels, lw, avg_factor=cls_avg),
            gliding_bbox_loss=smooth_l1_loss(
                bbox_pred, sampled["bbox_targets"].reshape(-1, 4),
                posf[:, None], avg_factor=n_samp),
            gliding_fix_loss=smooth_l1_loss(
                fix_pred, sampled["fix_targets"].reshape(-1, 4),
                posf[:, None], avg_factor=n_samp),
            gliding_ratio_loss=smooth_l1_loss(
                ratio_pred, sampled["ratio_targets"].reshape(-1, 1),
                posf[:, None], avg_factor=n_samp),
        )
        return losses

    # ------------------------------------------------------------------

    def predict(self, feats, proposals, prop_valid, scale_factor):
        b, p, _ = proposals.shape
        batch_idx = jnp.repeat(jnp.arange(b, dtype=jnp.float32), p)
        rois = jnp.concatenate(
            [batch_idx[:, None], proposals.reshape(b * p, 4)], 1)
        cls_score, bbox_pred, fix_pred, ratio_pred = self.forward_rois(
            feats, rois)
        scores = jax.nn.softmax(cls_score, axis=-1)[:, :-1]
        hbb = B.delta2bbox(rois[:, 1:], bbox_pred, self._coder.means,
                           self._coder.stds)
        polys = self._fix_coder.decode(hbb, fix_pred)
        hbb_polys = B.hbb2poly(hbb)
        use_hbb = (ratio_pred[:, 0] > self.ratio_thr)[:, None]
        polys = jnp.where(use_hbb, hbb_polys, polys)
        sf = jnp.repeat(scale_factor, p)[:, None]
        polys = polys / jnp.maximum(sf, 1e-6)
        return dict(polys=polys.reshape(b, p, 8),
                    scores=scores.reshape(b, p, self.num_classes),
                    valid=prop_valid)
