"""Oriented RPN head (Oriented R-CNN stage 1).

Capability parity with the reference ``OrientedRPNHead``
(``python/jdet/models/roi_heads/oriented_rpn_head.py:9-492``):
3x3 conv + 1x1 cls (sigmoid, 1 ch/anchor) + 1x1 reg (6-dim
midpoint-offset per anchor); training targets via MaxIoUAssigner on the
gt obbs' hbbs (with the OBB-path angle sign flip applied by the
caller), random 256-sampling, MidpointOffsetCoder encode against the gt
obbs; proposal generation with per-level top-k, midpoint-offset decode,
horizontal NMS on the obbs' hbbs with the per-level coordinate-offset
trick, top ``nms_post``.

TPU-first: everything static-shape — candidate sets are fixed-size
top-k selections with validity masks; proposals come out as a dense
[B, nms_post, 5] tensor + mask. A global ``pre_nms_cap`` bounds the
single NMS problem size (the reference runs NMS on up to
5 x nms_pre candidates; capping to the global top-k keeps the IoU
matrix in VMEM-friendly range with negligible recall impact).
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ...ops import box_ops as B
from ...ops.nms import (_greedy_suppress_mask, fast_top_k,
                         overlap_gt_mask_hbb)
from ...utils.registry import HEADS
from ..boxes.anchor_generator import AnchorGenerator
from ..boxes.anchor_target import anchor_target_single
from ..boxes.assigner import MaxIoUAssigner
from ..boxes.coder import MidpointOffsetCoder
from ..boxes.sampler import RandomSampler
from ..losses.common import binary_cross_entropy, smooth_l1_loss


@HEADS.register_module()
class OrientedRPNHead(nn.Module):
    in_channels: int = 256
    feat_channels: int = 256
    num_classes: int = 1
    reg_dim: int = 6
    min_bbox_size: float = 0.0
    nms_thresh: float = 0.8
    nms_pre: int = 2000
    nms_post: int = 2000
    pre_nms_cap: int = 4096
    pos_weight: float = -1.0
    allowed_border: int = 0
    anchor_generator: Any = None
    bbox_coder: Any = None
    assigner: Any = None
    sampler: Any = None
    loss_cls_weight: float = 1.0
    loss_bbox_weight: float = 1.0
    smooth_l1_beta: float = 1.0 / 9.0

    def setup(self):
        ag = self.anchor_generator or dict(
            scales=[8], ratios=[0.5, 1.0, 2.0],
            strides=[4, 8, 16, 32, 64])
        ag = {k: v for k, v in dict(ag).items() if k != "type"}
        self._anchor_gen = AnchorGenerator(**ag)
        bc = self.bbox_coder or dict(
            target_means=[0.0] * 6,
            target_stds=[1.0, 1.0, 1.0, 1.0, 0.5, 0.5])
        bc = {k: v for k, v in dict(bc).items() if k != "type"}
        self._coder = MidpointOffsetCoder(**bc)
        asn = self.assigner or dict(
            pos_iou_thr=0.7, neg_iou_thr=0.3, min_pos_iou=0.3,
            match_low_quality=True)
        asn = {k: v for k, v in dict(asn).items() if k != "type"}
        asn.pop("assigned_labels_filled", None)
        self._assigner = MaxIoUAssigner(**asn)
        smp = self.sampler or dict(num=256, pos_fraction=0.5)
        smp = {k: v for k, v in dict(smp).items() if k != "type"}
        self._sampler = RandomSampler(**smp)
        self.num_anchors = self._anchor_gen.num_base_anchors[0]

        # drop-in nn.Conv with an int8 serving path (RS_INT8=1); the
        # cls/reg prediction convs below stay bf16 — their outputs
        # feed box decode directly (quantization scope: VERDICT #2)
        from ...ops.quant import MaybeInt8Conv
        self.rpn_conv = MaybeInt8Conv(
            self.feat_channels, (3, 3), padding=1,
            kernel_init=nn.initializers.normal(0.01))
        self.rpn_cls = nn.Conv(self.num_anchors * self.num_classes, (1, 1),
                               kernel_init=nn.initializers.normal(0.01))
        self.rpn_reg = nn.Conv(self.num_anchors * self.reg_dim, (1, 1),
                               kernel_init=nn.initializers.normal(0.01))

    def forward_single(self, x, train: bool = False):
        # train must reach MaybeInt8Conv: the int8 serving path is
        # eval-only (its round/clip has zero gradient)
        x = nn.relu(self.rpn_conv(x, train))
        return self.rpn_cls(x), self.rpn_reg(x)

    def __call__(self, feats: Sequence[jnp.ndarray],
                 train: bool = False):
        """Returns per-level (cls [B,H,W,A], reg [B,H,W,A*6])."""
        outs = [self.forward_single(f, train) for f in feats]
        cls_scores = [o[0] for o in outs]
        bbox_preds = [o[1] for o in outs]
        return cls_scores, bbox_preds

    # ---------------- targets & loss ----------------

    def loss(self, cls_scores, bbox_preds, targets, rng):
        """Args:
          targets: dict with "rboxes" [B, G, 5] (data convention; angle
            flip to the OBB convention happens HERE, matching
            oriented_rpn_head.py:278-288), "gt_mask" [B, G],
            "img_hw" [B, 2], "pad_hw" [B, 2].
        """
        featmap_sizes = [tuple(c.shape[1:3]) for c in cls_scores]
        mlvl_anchors = self._anchor_gen.grid_anchors(featmap_sizes)
        flat_anchors = jnp.asarray(np.concatenate(mlvl_anchors, 0))
        num_lvl = [a.shape[0] for a in mlvl_anchors]

        gt_obb = targets["rboxes"].at[..., 4].multiply(-1.0)
        gt_hbb = B.obb2hbb(gt_obb)
        gt_mask = targets["gt_mask"]
        b = gt_obb.shape[0]

        # valid flags from pad shape (static per-batch here: full image)
        valid = jnp.asarray(np.concatenate(
            self._anchor_gen.valid_flags(
                featmap_sizes,
                (featmap_sizes[0][0] * self._anchor_gen.strides[0][1],
                 featmap_sizes[0][1] * self._anchor_gen.strides[0][0])), 0))
        # fixed-size tiles: one border for the whole batch
        img_h = targets["img_hw"][:, 0].max()
        img_w = targets["img_hw"][:, 1].max()
        inside = (valid
                  & (flat_anchors[:, 0] >= -self.allowed_border)
                  & (flat_anchors[:, 1] >= -self.allowed_border)
                  & (flat_anchors[:, 2] < img_w + self.allowed_border)
                  & (flat_anchors[:, 3] < img_h + self.allowed_border))

        keys = jax.random.split(rng, b)

        def per_image(hbb, obb, mask, key):
            return anchor_target_single(
                flat_anchors, inside, hbb, mask, None,
                self._assigner, self._sampler,
                self._coder.encode, key=key, pos_weight=self.pos_weight,
                gt_bboxes_encode=obb)

        res = jax.vmap(per_image)(gt_hbb, gt_obb, gt_mask, keys)
        num_total = (jnp.maximum(res.num_pos, 1)
                     + jnp.maximum(res.num_neg, 1)).sum()

        # per-level loss. The regression loss runs in the conv's
        # NATIVE NHWC [B, H, W, A*6] layout: reshaping predictions to
        # [B, H*W*A, 6] materializes a lane-dim-6 tensor (padded 128/6
        # on TPU tiles) plus relayout copies on both the forward and
        # the cotangent — ~8 ms/iter at P2 in the batch-8 train trace.
        # The (non-differentiable) targets get reshaped instead; the
        # anchor flat order (h, w, a) matches NHWC A-minor exactly
        # (grid_anchors row-major, A fastest — see get_proposals'
        # reg2 indexing).
        losses_cls, losses_bbox = [], []
        start = 0
        for lvl, n in enumerate(num_lvl):
            sl = slice(start, start + n)
            start += n
            h_l, w_l = featmap_sizes[lvl]
            cls = cls_scores[lvl].reshape(b, -1).astype(jnp.float32)
            reg = bbox_preds[lvl].astype(jnp.float32)  # [B,H,W,A*6]
            labels = res.labels[:, sl].astype(jnp.float32)
            lw = res.label_weights[:, sl]
            nhwc = (b, h_l, w_l, self.num_anchors * self.reg_dim)
            bt = res.bbox_targets[:, sl].reshape(nhwc)
            bw = res.bbox_weights[:, sl].reshape(nhwc)
            losses_cls.append(self.loss_cls_weight * binary_cross_entropy(
                cls, labels, lw, avg_factor=num_total))
            losses_bbox.append(self.loss_bbox_weight * smooth_l1_loss(
                reg, bt, bw, beta=self.smooth_l1_beta,
                avg_factor=num_total))
        return dict(loss_rpn_cls=sum(losses_cls),
                    loss_rpn_bbox=sum(losses_bbox))

    # ---------------- proposals ----------------

    def get_proposals(self, cls_scores, bbox_preds, img_hw):
        """Returns (proposals [B, nms_post, 5] obb, scores
        [B, nms_post], valid [B, nms_post])."""
        featmap_sizes = [tuple(c.shape[1:3]) for c in cls_scores]
        mlvl_anchors = [jnp.asarray(a) for a in
                        self._anchor_gen.grid_anchors(featmap_sizes)]
        b = cls_scores[0].shape[0]

        def per_image(args):
            cls_list, reg_list, hw = args
            cand_scores, cand_deltas, cand_anchors, cand_lvl = [], [], [], []
            na, rd = self.num_anchors, self.reg_dim
            for lvl in range(len(cls_list)):
                scores = jax.nn.sigmoid(
                    cls_list[lvl].reshape(-1).astype(jnp.float32))
                anchors = mlvl_anchors[lvl]
                k = min(self.nms_pre, scores.shape[0])
                top_s, top_i = fast_top_k(scores, k)
                # gather regression rows in the conv's native
                # [H*W, A*6] layout (that reshape is free) and slice
                # the anchor's 6 columns — reshaping the whole dense
                # map to [-1, 6] first re-tiles the padded lane dim, a
                # full-tensor relayout just to keep k rows
                reg2 = reg_list[lvl].reshape(-1, na * rd)
                rows = reg2[top_i // na].astype(jnp.float32)  # [k, A*6]
                cols = ((top_i % na)[:, None] * rd
                        + jnp.arange(rd)[None, :])
                deltas = jnp.take_along_axis(rows, cols, axis=1)
                cand_scores.append(top_s)
                cand_deltas.append(deltas)
                cand_anchors.append(anchors[top_i])
                cand_lvl.append(jnp.full((k,), lvl, jnp.float32))
            scores = jnp.concatenate(cand_scores)
            deltas = jnp.concatenate(cand_deltas)
            anchors = jnp.concatenate(cand_anchors)
            lvl_ids = jnp.concatenate(cand_lvl)

            # global cap before NMS (see module docstring)
            cap = min(self.pre_nms_cap, scores.shape[0])
            scores, sel = jax.lax.top_k(scores, cap)
            deltas = deltas[sel]
            anchors = anchors[sel]
            lvl_ids = lvl_ids[sel]

            proposals = self._coder.decode(anchors, deltas)
            ok = jnp.ones_like(scores, bool)
            if self.min_bbox_size >= 0:
                ok = ((proposals[:, 2] > self.min_bbox_size)
                      & (proposals[:, 3] > self.min_bbox_size))
            # level-offset trick: separate levels in coordinate space
            hbb = B.obb2hbb(proposals)
            span = hbb.max() - hbb.min()
            hbb = hbb + (lvl_ids * (span + 1.0))[:, None]

            order = jnp.argsort(-jnp.where(ok, scores, -jnp.inf))
            over = overlap_gt_mask_hbb(hbb[order], self.nms_thresh)
            keep_sorted = _greedy_suppress_mask(over, ok[order])
            keep = jnp.zeros_like(ok).at[order].set(keep_sorted)

            kept_scores = jnp.where(keep, scores, -jnp.inf)
            out_s, out_i = jax.lax.top_k(kept_scores,
                                         min(self.nms_post, cap))
            out_p = proposals[out_i]
            out_valid = jnp.isfinite(out_s)
            if self.nms_post > cap:
                pad = self.nms_post - cap
                out_p = jnp.pad(out_p, ((0, pad), (0, 0)))
                out_s = jnp.pad(out_s, (0, pad),
                                constant_values=-jnp.inf)
                out_valid = jnp.pad(out_valid, (0, pad))
            return out_p, jnp.where(out_valid, out_s, 0.0), out_valid

        # vmap over the batch: every image's top-k/decode/NMS runs as
        # one batched program instead of B serialized copies
        props, scores, valid = jax.vmap(
            lambda cl, rl, hw: per_image((list(cl), list(rl), hw)))(
            tuple(cls_scores), tuple(bbox_preds), img_hw)
        return props, scores, valid
