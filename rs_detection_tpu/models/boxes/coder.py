"""Box delta coders.

Capability parity with the reference coders
(``python/jdet/models/boxes/coder.py``): ``DeltaXYWHBBoxCoder`` (:9),
``DeltaXYWHABBoxCoder`` (:77), GV coders (:144-316),
``MidpointOffsetCoder`` (:319, Oriented RPN), and
``OrientedDeltaXYWHTCoder`` (:436, Oriented R-CNN stage 2).

All encode/decode functions are pure jnp/numpy (namespace-generic via
``box_ops``) and shape-polymorphic, so they run identically in the host
pipeline and under jit.
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np

from ...ops import box_ops as B
from ...utils.registry import BOXES


def _xp(*arrays):
    return B._xp(*arrays)


@BOXES.register_module()
class DeltaXYWHBBoxCoder:
    """Plain hbb delta coder (reference ``coder.py:9-75``)."""

    def __init__(self, target_means=(0., 0., 0., 0.),
                 target_stds=(1., 1., 1., 1.), clip_border=True):
        self.means = tuple(target_means)
        self.stds = tuple(target_stds)
        self.clip_border = clip_border

    def encode(self, bboxes, gt_bboxes):
        return B.bbox2delta(bboxes, gt_bboxes, self.means, self.stds)

    def decode(self, bboxes, pred_bboxes, max_shape=None,
               wh_ratio_clip=16 / 1000):
        return B.delta2bbox(bboxes, pred_bboxes, self.means, self.stds,
                            max_shape if self.clip_border else None,
                            wh_ratio_clip)


@BOXES.register_module()
class DeltaXYWHABBoxCoder:
    """Rotated-box delta coder in the proposal's rotated frame
    (reference ``coder.py:77-142``)."""

    def __init__(self, target_means=(0., 0., 0., 0., 0.),
                 target_stds=(1., 1., 1., 1., 1.), clip_border=True):
        self.means = tuple(target_means)
        self.stds = tuple(target_stds)
        self.clip_border = clip_border

    def encode(self, bboxes, gt_bboxes):
        return B.bbox2delta_rotated(bboxes, gt_bboxes, self.means, self.stds)

    def decode(self, bboxes, pred_bboxes, max_shape=None,
               wh_ratio_clip=16 / 1000):
        return B.delta2bbox_rotated(bboxes, pred_bboxes, self.means,
                                    self.stds, max_shape, wh_ratio_clip)


def midpoint_offset_encode(bboxes, gt_obbs, means, stds):
    """Oriented RPN 6-dim encode (reference ``coder.py:327-372``):
    hbb deltas of gt's enclosing box w.r.t. the hbb anchor, plus the
    normalized x of the topmost vertex and y of the rightmost vertex."""
    xp = _xp(bboxes, gt_obbs)
    px = (bboxes[..., 0] + bboxes[..., 2]) * 0.5
    py = (bboxes[..., 1] + bboxes[..., 3]) * 0.5
    pw = bboxes[..., 2] - bboxes[..., 0]
    ph = bboxes[..., 3] - bboxes[..., 1]

    hbb = B.obb2hbb(gt_obbs)
    poly = B.obb2poly(gt_obbs)
    gx = (hbb[..., 0] + hbb[..., 2]) * 0.5
    gy = (hbb[..., 1] + hbb[..., 3]) * 0.5
    gw = hbb[..., 2] - hbb[..., 0]
    gh = hbb[..., 3] - hbb[..., 1]

    xs = poly[..., 0::2]
    ys = poly[..., 1::2]
    y_min = ys.min(-1, keepdims=True)
    x_max = xs.max(-1, keepdims=True)
    # x of the topmost vertex (|y - ymin| <= 0.1 tolerance band, ties ->
    # larger x), y of the rightmost vertex (ties -> larger y)
    ga = xp.where(xp.abs(ys - y_min) > 0.1, -1000.0, xs).max(-1)
    gb = xp.where(xp.abs(xs - x_max) > 0.1, -1000.0, ys).max(-1)

    deltas = xp.stack(
        [(gx - px) / pw, (gy - py) / ph,
         xp.log(xp.maximum(gw, 1e-6) / pw), xp.log(xp.maximum(gh, 1e-6) / ph),
         (ga - gx) / gw, (gb - gy) / gh], axis=-1)
    return (deltas - xp.asarray(means)) / xp.asarray(stds)


def midpoint_offset_decode(bboxes, deltas, means, stds,
                           wh_ratio_clip=16 / 1000):
    """Oriented RPN decode (reference ``coder.py:373-433``): rebuild the
    quad from hbb + midpoint offsets, rescale vertices radially so all
    four diagonals equal the longest, convert via rectpoly2obb."""
    xp = _xp(bboxes, deltas)
    k = deltas.shape[-1] // 6
    means_t = xp.tile(xp.asarray(means, dtype=deltas.dtype), k)
    stds_t = xp.tile(xp.asarray(stds, dtype=deltas.dtype), k)
    d = deltas * stds_t + means_t
    dx, dy = d[..., 0::6], d[..., 1::6]
    max_ratio = abs(math.log(wh_ratio_clip))
    dw = xp.clip(d[..., 2::6], -max_ratio, max_ratio)
    dh = xp.clip(d[..., 3::6], -max_ratio, max_ratio)
    da = xp.clip(d[..., 4::6], -0.5, 0.5)
    db = xp.clip(d[..., 5::6], -0.5, 0.5)

    px = ((bboxes[..., 0] + bboxes[..., 2]) * 0.5)[..., None]
    py = ((bboxes[..., 1] + bboxes[..., 3]) * 0.5)[..., None]
    pw = (bboxes[..., 2] - bboxes[..., 0])[..., None]
    ph = (bboxes[..., 3] - bboxes[..., 1])[..., None]
    gw = pw * xp.exp(dw)
    gh = ph * xp.exp(dh)
    gx = px + pw * dx
    gy = py + ph * dy
    x1, y1 = gx - gw * 0.5, gy - gh * 0.5
    x2, y2 = gx + gw * 0.5, gy + gh * 0.5
    ga = gx + da * gw
    _ga = gx - da * gw
    gb = gy + db * gh
    _gb = gy - db * gh

    polys = xp.stack([ga, y1, x2, gb, _ga, y2, x1, _gb], axis=-1)
    center = xp.stack([gx, gy] * 4, axis=-1)
    rel = polys - center
    diag = xp.sqrt(rel[..., 0::2] ** 2 + rel[..., 1::2] ** 2)
    scale = diag.max(-1, keepdims=True) / xp.maximum(diag, 1e-6)
    rel = rel * xp.repeat(scale, 2, axis=-1)
    obb = B.rectpoly2obb(rel + center)                  # [..., K, 5]
    return obb.reshape(*deltas.shape[:-1], -1) if k > 1 \
        else obb[..., 0, :]


@BOXES.register_module()
class MidpointOffsetCoder:
    def __init__(self, target_means=(0., 0., 0., 0., 0., 0.),
                 target_stds=(1., 1., 1., 1., 1., 1.)):
        self.means = tuple(target_means)
        self.stds = tuple(target_stds)

    def encode(self, bboxes, gt_bboxes):
        return midpoint_offset_encode(bboxes, gt_bboxes, self.means,
                                      self.stds)

    def decode(self, bboxes, pred_bboxes, max_shape=None,
               wh_ratio_clip=16 / 1000):
        return midpoint_offset_decode(bboxes, pred_bboxes, self.means,
                                      self.stds, wh_ratio_clip)


def oriented_delta_encode(rois, gts, means, stds):
    """Stage-2 obb->obb encode (reference ``coder.py:444-477``): choose
    the theta offset closest to 0 (mod pi/2), swap gt w/h accordingly;
    dx/dy in the proposal frame rotated by -ptheta."""
    xp = _xp(rois, gts)
    px, py, pw, ph, pt = (rois[..., i] for i in range(5))
    gx, gy, gw, gh, gt = (gts[..., i] for i in range(5))
    d1 = B.regular_theta(gt - pt)
    d2 = B.regular_theta(gt - pt + math.pi / 2)
    pick1 = xp.abs(d1) < xp.abs(d2)
    gw_r = xp.where(pick1, gw, gh)
    gh_r = xp.where(pick1, gh, gw)
    dtheta = xp.where(pick1, d1, d2)
    c, s = xp.cos(-pt), xp.sin(-pt)
    ox, oy = gx - px, gy - py
    dx = (c * ox + s * oy) / pw
    dy = (-s * ox + c * oy) / ph
    dw = xp.log(xp.maximum(gw_r, 1e-6) / pw)
    dh = xp.log(xp.maximum(gh_r, 1e-6) / ph)
    deltas = xp.stack([dx, dy, dw, dh, dtheta], axis=-1)
    return (deltas - xp.asarray(means)) / xp.asarray(stds)


def oriented_delta_decode(rois, deltas, means, stds,
                          wh_ratio_clip=16 / 1000):
    """Stage-2 decode (reference ``coder.py:479-513``)."""
    xp = _xp(rois, deltas)
    k = deltas.shape[-1] // 5
    means_t = xp.tile(xp.asarray(means, dtype=deltas.dtype), k)
    stds_t = xp.tile(xp.asarray(stds, dtype=deltas.dtype), k)
    d = deltas * stds_t + means_t
    dx, dy = d[..., 0::5], d[..., 1::5]
    max_ratio = abs(math.log(wh_ratio_clip))
    dw = xp.clip(d[..., 2::5], -max_ratio, max_ratio)
    dh = xp.clip(d[..., 3::5], -max_ratio, max_ratio)
    dtheta = d[..., 4::5]
    px = rois[..., 0][..., None]
    py = rois[..., 1][..., None]
    pw = rois[..., 2][..., None]
    ph = rois[..., 3][..., None]
    pt = rois[..., 4][..., None]
    c, s = xp.cos(-pt), xp.sin(-pt)
    gx = dx * pw * c - dy * ph * s + px
    gy = dx * pw * s + dy * ph * c + py
    gw = pw * xp.exp(dw)
    gh = ph * xp.exp(dh)
    gtheta = B.regular_theta(dtheta + pt)
    obb = B.regular_obb(xp.stack([gx, gy, gw, gh, gtheta], axis=-1))
    return obb.reshape(deltas.shape) if k > 1 else obb[..., 0, :]


@BOXES.register_module()
class OrientedDeltaXYWHTCoder:
    def __init__(self, target_means=(0., 0., 0., 0., 0.),
                 target_stds=(1., 1., 1., 1., 1.)):
        self.means = tuple(target_means)
        self.stds = tuple(target_stds)

    def encode(self, bboxes, gt_bboxes):
        return oriented_delta_encode(bboxes, gt_bboxes, self.means,
                                     self.stds)

    def decode(self, bboxes, pred_bboxes, max_shape=None,
               wh_ratio_clip=16 / 1000):
        return oriented_delta_decode(bboxes, pred_bboxes, self.means,
                                     self.stds, wh_ratio_clip)


# --------------------------------------------------------------------------
# Gliding Vertex coders (reference coder.py:144-316)
# --------------------------------------------------------------------------

@BOXES.register_module()
class GVFixCoder:
    """Per-edge glide ratios of the poly inside its hbb
    (reference ``coder.py:144-204``)."""

    def encode(self, polys):
        xp = _xp(polys)
        # canonicalize vertex order: start from topmost, clockwise
        xs = polys[..., 0::2]
        ys = polys[..., 1::2]
        xmin = xs.min(-1)
        ymin = ys.min(-1)
        xmax = xs.max(-1)
        ymax = ys.max(-1)
        # per-vertex: is it the extreme on each side
        t_x = xp.take_along_axis(xs, ys.argmin(-1)[..., None], -1)[..., 0]
        r_y = xp.take_along_axis(ys, xs.argmax(-1)[..., None], -1)[..., 0]
        d_x = xp.take_along_axis(xs, ys.argmax(-1)[..., None], -1)[..., 0]
        l_y = xp.take_along_axis(ys, xs.argmin(-1)[..., None], -1)[..., 0]
        dt = (t_x - xmin) / xp.maximum(xmax - xmin, 1e-6)
        dr = (r_y - ymin) / xp.maximum(ymax - ymin, 1e-6)
        dd = (xmax - d_x) / xp.maximum(xmax - xmin, 1e-6)
        dl = (ymax - l_y) / xp.maximum(ymax - ymin, 1e-6)
        return xp.stack([dt, dr, dd, dl], axis=-1)

    def decode(self, hbboxes, fix_deltas):
        xp = _xp(hbboxes, fix_deltas)
        x1, y1, x2, y2 = (hbboxes[..., i] for i in range(4))
        w = x2 - x1
        h = y2 - y1
        dt, dr, dd, dl = (fix_deltas[..., i] for i in range(4))
        pts = xp.stack([
            x1 + dt * w, y1,
            x2, y1 + dr * h,
            x2 - dd * w, y2,
            x1, y2 - dl * h], axis=-1)
        return pts


@BOXES.register_module()
class GVRatioCoder:
    """obb-area / hbb-area ratio (reference ``coder.py:205-229``)."""

    def encode(self, polys):
        xp = _xp(polys)
        hbb = B.poly2hbb(polys)
        h_area = ((hbb[..., 2] - hbb[..., 0])
                  * (hbb[..., 3] - hbb[..., 1]))
        areas = B.get_bbox_areas(polys)
        return (areas / xp.maximum(h_area, 1e-6))[..., None]


@BOXES.register_module()
class GVDeltaXYWHBBoxCoder(DeltaXYWHBBoxCoder):
    """hbb coder without the legacy +1 (reference ``coder.py:230-316``)."""

    def encode(self, bboxes, gt_bboxes):
        xp = _xp(bboxes, gt_bboxes)
        px = (bboxes[..., 0] + bboxes[..., 2]) * 0.5
        py = (bboxes[..., 1] + bboxes[..., 3]) * 0.5
        pw = bboxes[..., 2] - bboxes[..., 0]
        ph = bboxes[..., 3] - bboxes[..., 1]
        gx = (gt_bboxes[..., 0] + gt_bboxes[..., 2]) * 0.5
        gy = (gt_bboxes[..., 1] + gt_bboxes[..., 3]) * 0.5
        gw = gt_bboxes[..., 2] - gt_bboxes[..., 0]
        gh = gt_bboxes[..., 3] - gt_bboxes[..., 1]
        deltas = xp.stack(
            [(gx - px) / pw, (gy - py) / ph,
             xp.log(xp.maximum(gw, 1e-6) / pw),
             xp.log(xp.maximum(gh, 1e-6) / ph)], axis=-1)
        return (deltas - xp.asarray(self.means)) / xp.asarray(self.stds)
