"""RoI-Transformer cascade heads (hbb roi -> rbox; rbox roi -> rbox).

Capability parity with the reference RoI-Transformer stack
(``python/jdet/models/networks/roi_transformer.py:9-275``,
``roi_heads/rbbox_head.py`` ``BBoxHeadRbbox``,
``convfc_rbbox_head.py:8,176,213`` ``ConvFCBBoxHeadRbbox`` /
``SharedFCBBoxHeadRbbox`` / ``KFIoUSharedFCBBoxHeadRbbox``):

  stage 1 — ``SharedFCBBoxHeadRbbox``: horizontal RoIAlign on hbb
  proposals, 2 FCs, class-agnostic 5-dim XYWHA delta predicting a
  *rotated* box from the hbb roi (converted via ``hbb2obb``);
  stage 2 — ``BBoxHeadRbbox``: rotated RoIAlign on the stage-1 rboxes,
  2 FCs, softmax cls + XYWHA refinement.

Static-shape sampling identical to ``OrientedHead``.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...ops import box_ops as B
from ...utils.registry import HEADS
from ..boxes.assigner import MaxIoUAssigner
from ..boxes.coder import DeltaXYWHABBoxCoder
from ..boxes.sampler import RandomSampler
from ..losses.common import smooth_l1_loss, softmax_cross_entropy
from ..roi_extractors.oriented_single_level import (
    OrientedSingleRoIExtractor, SingleRoIExtractor)


class _FCHead(nn.Module):
    """Shared 2-FC trunk + cls/reg linears."""

    num_classes: int
    reg_dim: int
    fc_out: int = 1024
    with_cls: bool = True

    @nn.compact
    def __call__(self, x):
        x = x.reshape(x.shape[0], -1)
        for i in range(2):
            x = nn.relu(nn.Dense(self.fc_out,
                                 kernel_init=nn.initializers
                                 .xavier_uniform(),
                                 name=f"fc{i}")(x))
        cls = nn.Dense(self.num_classes + 1,
                       kernel_init=nn.initializers.normal(0.01),
                       name="fc_cls")(x) if self.with_cls else None
        reg = nn.Dense(self.reg_dim,
                       kernel_init=nn.initializers.normal(0.001),
                       name="fc_reg")(x)
        return cls, reg


@HEADS.register_module()
class RoITransformerHead(nn.Module):
    """Both cascade stages of the RoI-Transformer."""

    num_classes: int = 15
    in_channels: int = 256
    featmap_strides: Any = (4, 8, 16, 32)
    stage1_stds: Any = (0.1, 0.1, 0.2, 0.2, 0.1)
    stage2_stds: Any = (0.05, 0.05, 0.1, 0.1, 0.05)
    score_thresh: float = 0.05
    sampler_num: int = 512
    pos_fraction: float = 0.25
    # stage-2 regression loss: 'smooth_l1' (SharedFCBBoxHeadRbbox) or
    # 'kfiou' (reference KFIoUSharedFCBBoxHeadRbbox,
    # convfc_rbbox_head.py:213 — same architecture, GDLoss-kfiou bbox
    # loss on decoded boxes)
    reg_loss: str = "smooth_l1"
    # 2 = full RoI-Transformer cascade; 1 = the FasterRCNNOBB
    # architecture (reference networks/faster_rcnn_obb.py:8 — hbb RPN
    # proposals, horizontal RoIAlign, one shared-FC stage predicting
    # rbox deltas; no rotated-align refinement stage)
    num_stages: int = 2

    def setup(self):
        self._h_extractor = SingleRoIExtractor(
            roi_layer=dict(output_size=7, sampling_ratio=2),
            out_channels=self.in_channels,
            featmap_strides=list(self.featmap_strides))
        self._r_extractor = (OrientedSingleRoIExtractor(
            roi_layer=dict(output_size=7, sampling_ratio=2),
            out_channels=self.in_channels,
            featmap_strides=list(self.featmap_strides))
            if self.num_stages == 2 else None)
        self._coder1 = DeltaXYWHABBoxCoder(
            target_stds=tuple(self.stage1_stds))
        self._coder2 = DeltaXYWHABBoxCoder(
            target_stds=tuple(self.stage2_stds))
        self._assigner_h = MaxIoUAssigner(pos_iou_thr=0.5,
                                          neg_iou_thr=0.5,
                                          min_pos_iou=0.5,
                                          match_low_quality=False)
        self._assigner_r = MaxIoUAssigner(
            pos_iou_thr=0.5, neg_iou_thr=0.5, min_pos_iou=0.5,
            match_low_quality=False,
            iou_calculator=dict(type="BboxOverlaps2D_rotated"))
        self._sampler = RandomSampler(num=self.sampler_num,
                                      pos_fraction=self.pos_fraction,
                                      add_gt_as_proposals=True)
        # stage 1 predicts rbox from hroi (class-agnostic)
        self.stage1 = _FCHead(self.num_classes, 5, name="stage1")
        self.stage2 = (_FCHead(self.num_classes, 5, name="stage2")
                       if self.num_stages == 2 else None)

    # -- shared sampling helper (fixed slots, positives first) --------

    def _sample(self, cand, cand_valid, overlaps_gt, gt_mask,
                gt_labels0, key, assigner):
        assigned, _ = assigner.assign(cand, overlaps_gt, gt_mask,
                                      anchor_mask=cand_valid)
        pos_mask, neg_mask = self._sampler.sample(assigned, key)
        priority = (pos_mask.astype(jnp.float32) * 2.0
                    + neg_mask.astype(jnp.float32)
                    - jnp.arange(cand.shape[0]) * 1e-9)
        _, sel = jax.lax.top_k(priority, self._sampler.num)
        return sel, pos_mask[sel], neg_mask[sel], \
            jnp.clip(assigned[sel] - 1, 0, overlaps_gt.shape[0] - 1)

    # ------------------------------------------------------------------

    def loss(self, feats, proposals, prop_valid, targets, rng):
        """proposals: [B, P, 4] hbb from the RPN."""
        b = proposals.shape[0]
        gt_rbox = targets["rboxes"]
        gt_hbb = targets["hboxes"]
        gt_mask = targets["gt_mask"]
        gt_labels0 = jnp.maximum(targets["labels"] - 1, 0)
        k1, k2 = jax.random.split(rng)
        keys1 = jax.random.split(k1, b)
        keys2 = jax.random.split(k2, b)
        s = self._sampler.num

        # ---- stage 1: hbb rois -> rbox deltas ----
        def stage1_sample(props, valid, hbb, rbox, mask, labels, key):
            cand = jnp.concatenate([props, hbb], 0)
            cand_valid = jnp.concatenate([valid, mask], 0)
            sel, pos, neg, matched = self._sample(
                cand, cand_valid, hbb, mask, labels, key,
                self._assigner_h)
            rois_h = cand[sel]
            rrois = B.hbb2obb(rois_h)
            t = self._coder1.encode(rrois, rbox[matched])
            labels_out = jnp.where(pos, labels[matched],
                                   self.num_classes)
            return dict(rois=rois_h, rrois=rrois,
                        targets=jnp.where(pos[:, None], t, 0),
                        labels=labels_out.astype(jnp.int32),
                        pos=pos, neg=neg)

        s1 = jax.vmap(stage1_sample)(proposals, prop_valid, gt_hbb,
                                     gt_rbox, gt_mask, gt_labels0,
                                     keys1)
        batch_idx = jnp.repeat(jnp.arange(b, dtype=jnp.float32), s)
        rois_h = jnp.concatenate(
            [batch_idx[:, None], s1["rois"].reshape(b * s, 4)], 1)
        feats_h = self._h_extractor(feats, rois_h)
        cls1, reg1 = self.stage1(feats_h)

        pos1 = s1["pos"].reshape(-1)
        neg1 = s1["neg"].reshape(-1)
        lw1 = jnp.where(pos1, 1.0, jnp.where(neg1, 1.0, 0.0))
        losses = dict(
            rbbox_cls_loss_1=softmax_cross_entropy(
                cls1, s1["labels"].reshape(-1), lw1,
                avg_factor=jnp.maximum((lw1 > 0).sum(), 1.0)),
            rbbox_reg_loss_1=smooth_l1_loss(
                reg1, s1["targets"].reshape(-1, 5),
                pos1.astype(jnp.float32)[:, None],
                avg_factor=float(b * s)),
        )

        if self.num_stages == 1:
            return losses

        # ---- stage 2: decoded rboxes -> refinement ----
        rboxes1 = self._coder1.decode(
            s1["rrois"].reshape(b * s, 5),
            jax.lax.stop_gradient(reg1)).reshape(b, s, 5)

        def stage2_sample(rprops, rbox, mask, labels, key):
            valid = jnp.ones(rprops.shape[0], bool)
            cand = jnp.concatenate([rprops, rbox], 0)
            cand_valid = jnp.concatenate([valid, mask], 0)
            sel, pos, neg, matched = self._sample(
                cand, cand_valid, rbox, mask, labels, key,
                self._assigner_r)
            rois_r = cand[sel]
            t = self._coder2.encode(rois_r, rbox[matched])
            labels_out = jnp.where(pos, labels[matched],
                                   self.num_classes)
            return dict(rois=rois_r,
                        targets=jnp.where(pos[:, None], t, 0),
                        gt_boxes=jnp.where(pos[:, None],
                                           rbox[matched], 0),
                        labels=labels_out.astype(jnp.int32),
                        pos=pos, neg=neg)

        s2 = jax.vmap(stage2_sample)(rboxes1, gt_rbox, gt_mask,
                                     gt_labels0, keys2)
        rois_r = jnp.concatenate(
            [batch_idx[:, None], s2["rois"].reshape(b * s, 5)], 1)
        feats_r = self._r_extractor(feats, rois_r, training=True)
        cls2, reg2 = self.stage2(feats_r)
        pos2 = s2["pos"].reshape(-1)
        neg2 = s2["neg"].reshape(-1)
        lw2 = jnp.where(pos2, 1.0, jnp.where(neg2, 1.0, 0.0))
        losses.update(rbbox_cls_loss_2=softmax_cross_entropy(
            cls2, s2["labels"].reshape(-1), lw2,
            avg_factor=jnp.maximum((lw2 > 0).sum(), 1.0)))
        if self.reg_loss == "kfiou":
            from ..losses.poly_iou_loss import kfiou_loss

            # negatives get unit dummy boxes: their weight is 0, but
            # degenerate (w=h=0) boxes would make the gaussian
            # covariance singular and poison the loss with NaN*0
            dummy = jnp.asarray([0.0, 0.0, 1.0, 1.0, 0.0])
            rois_flat = jnp.where(pos2[:, None],
                                  s2["rois"].reshape(b * s, 5), dummy)
            pred_dec = self._coder2.decode(
                rois_flat, jnp.where(pos2[:, None], reg2, 0.0))
            tgt_dec = jnp.where(pos2[:, None],
                                s2["gt_boxes"].reshape(b * s, 5), dummy)
            losses.update(rbbox_reg_loss_2=kfiou_loss(
                reg2, s2["targets"].reshape(-1, 5),
                pred_decode=pred_dec, targets_decode=tgt_dec,
                weight=pos2.astype(jnp.float32),
                avg_factor=jnp.maximum(pos2.sum(), 1.0)))
        else:
            losses.update(rbbox_reg_loss_2=smooth_l1_loss(
                reg2, s2["targets"].reshape(-1, 5),
                pos2.astype(jnp.float32)[:, None],
                avg_factor=float(b * s)))
        return losses

    # ------------------------------------------------------------------

    def predict(self, feats, proposals, prop_valid, scale_factor):
        b, p, _ = proposals.shape
        batch_idx = jnp.repeat(jnp.arange(b, dtype=jnp.float32), p)
        rois_h = jnp.concatenate(
            [batch_idx[:, None], proposals.reshape(b * p, 4)], 1)
        feats_h = self._h_extractor(feats, rois_h)
        cls1, reg1 = self.stage1(feats_h)
        rrois = B.hbb2obb(rois_h[:, 1:])
        rboxes1 = self._coder1.decode(rrois, reg1)

        if self.num_stages == 1:
            # FasterRCNNOBB: classify + decode from the hroi directly
            scores = jax.nn.softmax(cls1, axis=-1)[:, :-1]
            sf = jnp.repeat(scale_factor, p)[:, None]
            obbs = rboxes1.at[:, :4].divide(jnp.maximum(sf, 1e-6))
            polys = B.rotated_box_to_poly(obbs, best_begin=False)
            return dict(polys=polys.reshape(b, p, 8),
                        scores=scores.reshape(b, p, self.num_classes),
                        valid=prop_valid)

        rois_r = jnp.concatenate([batch_idx[:, None], rboxes1], 1)
        feats_r = self._r_extractor(feats, rois_r)
        cls2, reg2 = self.stage2(feats_r)
        scores = jax.nn.softmax(cls2, axis=-1)[:, :-1]
        obbs = self._coder2.decode(rboxes1, reg2)
        sf = jnp.repeat(scale_factor, p)[:, None]
        obbs = obbs.at[:, :4].divide(jnp.maximum(sf, 1e-6))
        polys = B.rotated_box_to_poly(obbs, best_begin=False)
        return dict(polys=polys.reshape(b, p, 8),
                    scores=scores.reshape(b, p, self.num_classes),
                    valid=prop_valid)


# registry aliases for the reference head names (convfc_rbbox_head.py)
HEADS.register_module(name="SharedFCBBoxHeadRbbox",
                      module=RoITransformerHead)
HEADS.register_module(name="BBoxHeadRbbox", module=RoITransformerHead)
HEADS.register_module(name="ConvFCBBoxHeadRbbox",
                      module=RoITransformerHead)
@HEADS.register_module(name="KFIoUSharedFCBBoxHeadRbbox")
def _kfiou_shared_fc_head(**kw):
    """Reference ``convfc_rbbox_head.py:213``: the shared-FC rbbox head
    with the KFIoU regression loss."""
    kw.setdefault("reg_loss", "kfiou")
    import dataclasses

    fields = {f.name for f in dataclasses.fields(RoITransformerHead)}
    return RoITransformerHead(**{k: v for k, v in kw.items()
                                 if k in fields})
