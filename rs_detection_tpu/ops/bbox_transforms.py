"""Extended box transforms: legacy rotated delta coders, best-match
rroi selection, mask->poly, result packing.

Capability parity with the reference
(``python/jdet/ops/bbox_transforms.py``) for the functions not already
covered by :mod:`rs_detection_tpu.ops.box_ops`: ``dbbox2delta_v2/v3``
(:206, :7), ``delta2dbbox_v2/v3`` (:325, :281),
``choose_best_match_batch`` (:237), ``best_match_dbbox2delta`` (:268),
``choose_best_Rroi_batch`` (:446), ``choose_best_obb_batch`` (:467),
``hbb2obb_v2`` (:34), ``mask2poly`` (:57),
``polygonToRotRectangle_batch`` (:81), ``dbbox2result`` (:276),
``roi2droi`` (:436). Namespace-generic (numpy / jnp) like box_ops.
"""

from __future__ import annotations

import math

import numpy as np

from .box_ops import (PI, _xp, bbox2roi, get_bbox_areas,  # noqa: F401
                      get_bbox_dim, get_bbox_type, hbb2obb, norm_angle,
                      obb2hbb, obb2poly, poly2hbb, poly_to_rotated_box,
                      rectpoly2obb, regular_obb, regular_theta)
from .box_ops import arb2roi as dbbox2roi  # noqa: F401


def hbb2obb_v2(boxes):
    """hbb -> (cx, cy, w, h, -pi/2) (reference ``:34-44``)."""
    xp = _xp(boxes)
    cx = (boxes[..., 0] + boxes[..., 2]) * 0.5
    cy = (boxes[..., 1] + boxes[..., 3]) * 0.5
    w = boxes[..., 2] - boxes[..., 0] + 1.0
    h = boxes[..., 3] - boxes[..., 1] + 1.0
    theta = xp.full_like(cx, -PI / 2)
    return xp.stack([cx, cy, w, h, theta], axis=-1)


def dbbox2delta_v2(proposals, gt, means=(0.,) * 5, stds=(1.,) * 5):
    """Rotated delta encode, v2 convention (reference ``:206-235``):
    dx/dy in the proposal frame, dangle as normalized 2pi-period."""
    xp = _xp(proposals, gt)
    pw, ph, pa = proposals[..., 2], proposals[..., 3], proposals[..., 4]
    c, s = xp.cos(pa), xp.sin(pa)
    ox = gt[..., 0] - proposals[..., 0]
    oy = gt[..., 1] - proposals[..., 1]
    dx = (c * ox + s * oy) / pw
    dy = (-s * ox + c * oy) / ph
    dw = xp.log(xp.maximum(gt[..., 2], 1e-6) / pw)
    dh = xp.log(xp.maximum(gt[..., 3], 1e-6) / ph)
    da = ((gt[..., 4] - pa) % (2 * PI)) / (2 * PI)
    deltas = xp.stack([dx, dy, dw, dh, da], axis=-1)
    return (deltas - xp.asarray(means)) / xp.asarray(stds)


def delta2dbbox_v2(rois, deltas, means=(0.,) * 5, stds=(1.,) * 5,
                   wh_ratio_clip=16 / 1000):
    xp = _xp(rois, deltas)
    d = deltas * xp.asarray(stds) + xp.asarray(means)
    max_ratio = abs(math.log(wh_ratio_clip))
    pw, ph, pa = rois[..., 2], rois[..., 3], rois[..., 4]
    c, s = xp.cos(pa), xp.sin(pa)
    gx = d[..., 0] * pw * c - d[..., 1] * ph * s + rois[..., 0]
    gy = d[..., 0] * pw * s + d[..., 1] * ph * c + rois[..., 1]
    gw = pw * xp.exp(xp.clip(d[..., 2], -max_ratio, max_ratio))
    gh = ph * xp.exp(xp.clip(d[..., 3], -max_ratio, max_ratio))
    ga = d[..., 4] * 2 * PI + pa
    return xp.stack([gx, gy, gw, gh, ga], axis=-1)


def dbbox2delta_v3(proposals, gt, means=(0.,) * 5, stds=(1.,) * 5):
    """v3: like v2 but dangle normalized to [-pi/2, pi/2) / pi
    (reference ``:7-32``)."""
    xp = _xp(proposals, gt)
    base = dbbox2delta_v2(proposals, gt, (0.,) * 5, (1.,) * 5)
    da = regular_theta(gt[..., 4] - proposals[..., 4]) / (2 * PI)
    deltas = xp.concatenate([base[..., :4], da[..., None]], axis=-1)
    return (deltas - xp.asarray(means)) / xp.asarray(stds)


def delta2dbbox_v3(rois, deltas, means=(0.,) * 5, stds=(1.,) * 5,
                   wh_ratio_clip=16 / 1000):
    xp = _xp(rois, deltas)
    d = deltas * xp.asarray(stds) + xp.asarray(means)
    out = delta2dbbox_v2(rois, xp.concatenate(
        [d[..., :4], xp.zeros_like(d[..., 4:5])], -1))
    ga = d[..., 4] * 2 * PI + rois[..., 4]
    return xp.concatenate([out[..., :4], ga[..., None]], axis=-1)


def choose_best_match_batch(rrois, gt_rois):
    """For each (rroi, gt) pair pick the gt representation (out of the
    4 theta+k*pi/2 variants) closest in angle to the rroi
    (reference ``:237-266``)."""
    xp = _xp(rrois, gt_rois)
    gx, gy, gw, gh, ga = (gt_rois[..., i] for i in range(5))
    ra = rrois[..., 4]
    cands = []
    for k in range(4):
        theta = ga + k * PI / 2.0
        w = gw if k % 2 == 0 else gh
        h = gh if k % 2 == 0 else gw
        cands.append(xp.stack([gx, gy, w, h, theta], axis=-1))
    cands = xp.stack(cands, axis=0)                  # [4, ..., 5]
    diff = xp.abs(regular_theta(cands[..., 4] - ra[None]))
    best = xp.argmin(diff, axis=0)
    take = xp.take_along_axis(
        cands, best[None, ..., None], axis=0)[0]
    return take


def best_match_dbbox2delta(rrois, gt, means=(0.,) * 5, stds=(1.,) * 5):
    """Encode against the best-matching gt representation
    (reference ``:268-274``)."""
    best_gt = choose_best_match_batch(rrois, gt)
    return dbbox2delta_v3(rrois, best_gt, means, stds)


def choose_best_Rroi_batch(rrois):
    """Normalize rrois to w >= h with theta in [-pi/4, 3pi/4)
    (reference ``:446-465``)."""
    xp = _xp(rrois)
    x, y, w, h, t = (rrois[..., i] for i in range(5))
    swap = w < h
    w_r = xp.where(swap, h, w)
    h_r = xp.where(swap, w, h)
    t_r = norm_angle(xp.where(swap, t + PI / 2, t), "le135")
    return xp.stack([x, y, w_r, h_r, t_r], axis=-1)


def choose_best_obb_batch(obbs):
    """Alias semantics of ``:467-481`` (same normalization)."""
    return choose_best_Rroi_batch(obbs)


def roi2droi(rois):
    """hbb rois (idx, x1, y1, x2, y2) -> rotated rois
    (idx, cx, cy, w, h, -pi/2) (reference ``:436-444``)."""
    xp = _xp(rois)
    obb = hbb2obb_v2(rois[:, 1:5])
    return xp.concatenate([rois[:, :1], obb], axis=1)


def polygonToRotRectangle_batch(polys, with_module=True):
    """8-coord polys -> (cx, cy, w, h, theta) via edge fitting
    (reference ``:81-127``); ``with_module`` wraps theta into
    [-pi/4, 3pi/4)."""
    rb = poly_to_rotated_box(np.asarray(polys, np.float32),
                             "le135" if with_module else "le90")
    return rb


def mask2poly_single(binary_mask):
    """Binary mask -> min-area-rect poly via cv2 (host only,
    reference ``:46-55``)."""
    import cv2

    contours, _ = cv2.findContours(binary_mask.astype(np.uint8),
                                   cv2.RETR_EXTERNAL,
                                   cv2.CHAIN_APPROX_SIMPLE)
    if not contours:
        return np.zeros((4, 2), np.float32)
    contour = max(contours, key=cv2.contourArea)
    rect = cv2.minAreaRect(contour)
    return cv2.boxPoints(rect).astype(np.float32)


def mask2poly(binary_mask_list):
    return [mask2poly_single(m) for m in binary_mask_list]


def gt_mask_bp_obbs(gt_masks, with_module=True):
    """gt masks -> best-point obbs (reference ``:421-428``)."""
    polys = np.stack([p.reshape(-1) for p in mask2poly(gt_masks)])
    return polygonToRotRectangle_batch(polys, with_module)


def gt_mask_bp_obbs_list(gt_masks_list):
    return [gt_mask_bp_obbs(m) for m in gt_masks_list]


def dbbox2result(dbboxes, labels, num_classes):
    """Split detections into per-class lists (reference ``:276-279``;
    num_classes includes background)."""
    dbboxes = np.asarray(dbboxes)
    labels = np.asarray(labels)
    return [dbboxes[labels == i] for i in range(num_classes - 1)]
