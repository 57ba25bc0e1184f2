"""Max-IoU assignment as a pure, static-shape jnp function.

Capability parity with the reference ``MaxIoUAssigner`` /
``MaxIoUAssignerRbbox`` (``python/jdet/models/boxes/assigner.py:19-224``).

TPU-first reformulation: instead of dynamic boolean indexing over a
variable number of GTs, GTs are padded to a fixed ``MAX_GT`` with a
validity mask; invalid GT columns are masked to IoU = -1 so they can
never win an argmax. The assignment result is a dense per-anchor
vector: -1 = ignore, 0 = negative, k > 0 = matched GT index k-1.
"""

from __future__ import annotations

from typing import Optional, Tuple, Union

import jax.numpy as jnp

from ...ops.nms import bbox_overlaps_hbb
from ...ops.rotated_iou import box_iou_rotated
from ...utils.registry import BOXES


def assign_wrt_overlaps(overlaps: jnp.ndarray,
                        gt_mask: jnp.ndarray,
                        pos_iou_thr: float,
                        neg_iou_thr: Union[float, Tuple[float, float]],
                        min_pos_iou: float = 0.0,
                        match_low_quality: bool = True,
                        gt_max_assign_all: bool = True,
                        anchor_mask: Optional[jnp.ndarray] = None):
    """Assign anchors to GTs from an IoU matrix.

    Args:
      overlaps: [A, G] IoU of anchors vs (padded) GTs.
      gt_mask: [G] bool validity of each GT slot.
      pos_iou_thr / neg_iou_thr / min_pos_iou / match_low_quality:
        reference semantics (``assigner.py:81-171``).

    Returns:
      (assigned_gt_inds [A] int32, max_overlaps [A]) where
      assigned_gt_inds uses -1/0/k+1 encoding.
    """
    a = overlaps.shape[0]
    masked = jnp.where(gt_mask[None, :], overlaps, -1.0)
    if anchor_mask is not None:
        # excluded anchors (outside image border) must neither become
        # negatives nor win a low-quality rescue — equivalent to the
        # reference's physical removal + unmap (anchor_target.py:127-180)
        masked = jnp.where(anchor_mask[:, None], masked, -1.0)
    max_overlaps = masked.max(axis=1)
    argmax_overlaps = masked.argmax(axis=1)

    assigned = jnp.full((a,), -1, jnp.int32)
    # negatives
    if isinstance(neg_iou_thr, (tuple, list)):
        lo, hi = neg_iou_thr
        neg = (max_overlaps >= lo) & (max_overlaps < hi)
    else:
        neg = (max_overlaps >= 0) & (max_overlaps < neg_iou_thr)
    assigned = jnp.where(neg, 0, assigned)
    # positives
    pos = max_overlaps >= pos_iou_thr
    assigned = jnp.where(pos, argmax_overlaps.astype(jnp.int32) + 1,
                         assigned)

    if match_low_quality:
        # rescue: for each GT, anchors tying its best IoU (>= min_pos_iou)
        gt_max = masked.max(axis=0)                        # [G]
        is_gt_best = (masked == gt_max[None, :]) & gt_mask[None, :] \
            & (gt_max[None, :] >= min_pos_iou) & (gt_max[None, :] > 0)
        if not gt_max_assign_all:
            gt_argmax = masked.argmax(axis=0)              # [G]
            only_best = jnp.zeros_like(is_gt_best).at[
                gt_argmax, jnp.arange(masked.shape[1])].set(True)
            is_gt_best = is_gt_best & only_best
        # later GT wins on conflicts, matching the reference's
        # sequential per-gt overwrite loop (assigner.py:158-166)
        g = masked.shape[1]
        gt_ids = jnp.arange(1, g + 1, dtype=jnp.int32)
        has_rescue = is_gt_best.any(axis=1)
        # later GT overwrites earlier on conflicts (incl. thresholded
        # positives), matching the reference's per-gt loop order
        last_rescue = jnp.where(is_gt_best, gt_ids[None, :], -1).max(axis=1)
        assigned = jnp.where(has_rescue, last_rescue, assigned)
    return assigned, max_overlaps


@BOXES.register_module()
class MaxIoUAssigner:
    """Config-built assigner operating on hbb boxes
    (reference ``assigner.py:19-171``)."""

    iou_kind = "hbb"

    def __init__(self, pos_iou_thr, neg_iou_thr, min_pos_iou=0.0,
                 gt_max_assign_all=True, ignore_iof_thr=-1,
                 ignore_wrt_candidates=True, match_low_quality=True,
                 assigned_labels_filled=-1, iou_calculator=None):
        self.pos_iou_thr = pos_iou_thr
        self.neg_iou_thr = (tuple(neg_iou_thr)
                            if isinstance(neg_iou_thr, (list, tuple))
                            else neg_iou_thr)
        self.min_pos_iou = min_pos_iou
        self.gt_max_assign_all = gt_max_assign_all
        self.ignore_iof_thr = ignore_iof_thr
        self.ignore_wrt_candidates = ignore_wrt_candidates
        self.match_low_quality = match_low_quality
        if iou_calculator is not None:
            t = iou_calculator.get("type", "") if isinstance(
                iou_calculator, dict) else str(iou_calculator)
            if "rotated" in t.lower():
                self.iou_kind = "rotated"

    def overlaps(self, bboxes, gt_bboxes):
        if self.iou_kind == "rotated":
            return box_iou_rotated(bboxes[:, :5], gt_bboxes[:, :5])
        return bbox_overlaps_hbb(bboxes[:, :4], gt_bboxes[:, :4])

    def assign(self, bboxes, gt_bboxes, gt_mask,
               gt_bboxes_ignore: Optional[jnp.ndarray] = None,
               gt_ignore_mask: Optional[jnp.ndarray] = None,
               anchor_mask: Optional[jnp.ndarray] = None):
        """Returns (assigned_gt_inds [A], max_overlaps [A])."""
        overlaps = self.overlaps(bboxes, gt_bboxes)
        assigned, max_overlaps = assign_wrt_overlaps(
            overlaps, gt_mask, self.pos_iou_thr, self.neg_iou_thr,
            self.min_pos_iou, self.match_low_quality,
            self.gt_max_assign_all, anchor_mask=anchor_mask)
        if (self.ignore_iof_thr > 0 and gt_bboxes_ignore is not None):
            if self.iou_kind == "rotated":
                iof = box_iou_rotated(bboxes[:, :5],
                                      gt_bboxes_ignore[:, :5], mode="iof")
            else:
                iof = bbox_overlaps_hbb(bboxes[:, :4],
                                        gt_bboxes_ignore[:, :4], mode="iof")
            if gt_ignore_mask is not None:
                iof = jnp.where(gt_ignore_mask[None, :], iof, 0.0)
            ignore = iof.max(axis=1) > self.ignore_iof_thr
            assigned = jnp.where(ignore, -1, assigned)
        return assigned, max_overlaps


@BOXES.register_module()
class MaxIoUAssignerRbbox(MaxIoUAssigner):
    """Rotated-IoU variant (reference ``assigner.py:173-224``)."""

    iou_kind = "rotated"
