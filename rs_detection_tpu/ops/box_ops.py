"""Rotated-box algebra: angle conventions, conversions, delta coder math.

Capability parity with the reference box math
(``python/jdet/models/boxes/box_ops.py`` and
``python/jdet/ops/bbox_transforms.py``), re-implemented as pure,
vectorized functions that work identically on numpy arrays (host-side
data pipeline) and jnp arrays (inside jit). All functions are
shape-polymorphic over leading dims and contain no Python branching on
data, so they trace cleanly under ``jax.jit``.

Box formats:
  hbb  — ``(x0, y0, x1, y1)`` axis-aligned
  obb  — ``(cx, cy, w, h, theta)`` rotated, theta in radians
  poly — ``(x0, y0, ..., x3, y3)`` free quadrilateral

Angle conventions (reference ``box_ops.py:176-182``, SURVEY A.1):
  ``le90``  -> theta in [-pi/2, pi/2)
  ``le135`` -> theta in [-pi/4, 3pi/4)
Two polygon parameterizations coexist (SURVEY A.1): the "JDet" one
(``rotated_box_to_poly*``, y-down positive rotation) and the
"OBBDetection" one (``obb2poly*``, opposite angle sign) used by the
Oriented R-CNN path; both are kept, as is the sign flip at the OBB-path
boundary (handled by callers).
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np

PI = math.pi
HALF_PI = PI / 2.0


def _xp(*arrays):
    """Pick numpy or jax.numpy based on the input array types."""
    for a in arrays:
        if isinstance(a, jnp.ndarray) and not isinstance(a, np.ndarray):
            return jnp
    return np


# ---------------------------------------------------------------------------
# Angle normalization
# ---------------------------------------------------------------------------

def norm_angle(angle, angle_version: str = "le135"):
    """Normalize angles: le90 -> [-pi/2, pi/2); le135 -> [-pi/4, 3pi/4)."""
    lo = -HALF_PI if angle_version == "le90" else -PI / 4.0
    return (angle - lo) % PI + lo


def regular_theta(theta, mode: str = "180", start: float = -HALF_PI):
    """Wrap theta into [start, start + pi) (or 2*pi for mode='360')."""
    cycle = 2 * PI if mode == "360" else PI
    return (theta - start) % cycle + start


def regular_obb(obboxes):
    """Force w >= h by swapping (w, h) and rotating theta by pi/2."""
    xp = _xp(obboxes)
    x, y, w, h, theta = (obboxes[..., i] for i in range(5))
    swap = w > h
    w_r = xp.where(swap, w, h)
    h_r = xp.where(swap, h, w)
    t_r = regular_theta(xp.where(swap, theta, theta + HALF_PI))
    return xp.stack([x, y, w_r, h_r, t_r], axis=-1)


def mintheta_obb(obboxes):
    """Pick the (w,h,theta) representation with the smaller |theta|."""
    xp = _xp(obboxes)
    x, y, w, h, theta = (obboxes[..., i] for i in range(5))
    t1 = regular_theta(theta)
    t2 = regular_theta(theta + HALF_PI)
    pick1 = xp.abs(t1) < xp.abs(t2)
    w_r = xp.where(pick1, w, h)
    h_r = xp.where(pick1, h, w)
    t_r = xp.where(pick1, t1, t2)
    return xp.stack([x, y, w_r, h_r, t_r], axis=-1)


# ---------------------------------------------------------------------------
# poly <-> obb <-> hbb conversions (JDet convention)
# ---------------------------------------------------------------------------

def poly_to_rotated_box(polys, angle_version: str = "le135"):
    """Quadrilateral -> (cx, cy, w, h, theta).

    w = longer of edges (p1,p2)/(p2,p3); theta follows the longer edge
    (via p1->p2 if edge1 longer else p1->p4); center = midpoint(p1, p3).
    Matches reference ``box_ops.py:440-518``.
    """
    xp = _xp(polys)
    p = polys[..., :8]
    x1, y1, x2, y2, x3, y3, x4, y4 = (p[..., i] for i in range(8))
    edge1 = xp.sqrt((x1 - x2) ** 2 + (y1 - y2) ** 2)
    edge2 = xp.sqrt((x2 - x3) ** 2 + (y2 - y3) ** 2)
    width = xp.maximum(edge1, edge2)
    height = xp.minimum(edge1, edge2)
    angle1 = xp.arctan2(y2 - y1, x2 - x1)
    angle2 = xp.arctan2(y4 - y1, x4 - x1)
    angle = norm_angle(xp.where(edge1 > edge2, angle1, angle2), angle_version)
    cx = (x1 + x3) / 2.0
    cy = (y1 + y3) / 2.0
    return xp.stack([cx, cy, width, height, angle], axis=-1)


# numpy alias used by the host-side data pipeline
def poly_to_rotated_box_np(polys, angle_version: str = "le90"):
    polys = np.asarray(polys, dtype=np.float32)
    if polys.size == 0:
        return np.zeros((0, 5), dtype=np.float32)
    return poly_to_rotated_box(polys, angle_version).astype(np.float32)


def get_best_begin_point(polys):
    """Reorder each quad's vertices to best match its hbb's TL-TR-BR-BL.

    Vectorized version of the reference's per-poly search
    (``box_ops.py:524-552``): among the 4 cyclic rotations, pick the one
    minimizing the summed distance to the axis-aligned corner sequence.
    Extra trailing columns (e.g. score) are preserved.
    """
    xp = _xp(polys)
    pts = polys[..., :8].reshape(*polys.shape[:-1], 4, 2)  # [..., 4, 2]
    xmin = pts[..., 0].min(axis=-1)
    ymin = pts[..., 1].min(axis=-1)
    xmax = pts[..., 0].max(axis=-1)
    ymax = pts[..., 1].max(axis=-1)
    corners = xp.stack(
        [
            xp.stack([xmin, ymin], axis=-1),
            xp.stack([xmax, ymin], axis=-1),
            xp.stack([xmax, ymax], axis=-1),
            xp.stack([xmin, ymax], axis=-1),
        ],
        axis=-2,
    )  # [..., 4, 2]
    # 4 cyclic rotations: rot[k, i] = pts[(i + k) % 4]
    rots = xp.stack([xp.roll(pts, -k, axis=-2) for k in range(4)], axis=-3)
    dists = xp.sqrt(((rots - corners[..., None, :, :]) ** 2).sum(-1)).sum(-1)
    best = xp.argmin(dists, axis=-1)
    chosen = xp.take_along_axis(
        rots, best[..., None, None, None], axis=-3
    ).reshape(*polys.shape[:-1], 8)
    if polys.shape[-1] > 8:
        chosen = xp.concatenate([chosen, polys[..., 8:]], axis=-1)
    return chosen


def rotated_box_to_poly(rrects, angle_version: str = "le135",
                        best_begin: bool = True):
    """(cx, cy, w, h, theta) -> quadrilateral, JDet convention.

    Corner order (before best-begin reordering): the rectangle
    ``[(-w/2,-h/2), (w/2,-h/2), (w/2,h/2), (-w/2,h/2)]`` rotated by
    ``R = [[cos, -sin], [sin, cos]]`` (reference ``box_ops.py:554-628``).
    ``le90`` and ``le135`` produce the same vertex set; both reference
    variants apply best-begin-point reordering.
    """
    xp = _xp(rrects)
    cx, cy, w, h, theta = (rrects[..., i] for i in range(5))
    c, s = xp.cos(theta), xp.sin(theta)
    dx = w / 2.0
    dy = h / 2.0
    # corners in local frame: (-dx,-dy), (dx,-dy), (dx,dy), (-dx,dy)
    lx = xp.stack([-dx, dx, dx, -dx], axis=-1)
    ly = xp.stack([-dy, -dy, dy, dy], axis=-1)
    px = c[..., None] * lx - s[..., None] * ly + cx[..., None]
    py = s[..., None] * lx + c[..., None] * ly + cy[..., None]
    poly = xp.stack([px, py], axis=-1).reshape(*rrects.shape[:-1], 8)
    if best_begin:
        poly = get_best_begin_point(poly)
    return poly


def rotated_box_to_poly_np(rrects, angle_version: str = "le90"):
    rrects = np.asarray(rrects, dtype=np.float32)
    if rrects.shape[0] == 0:
        return np.zeros((0, 8), dtype=np.float32)
    return rotated_box_to_poly(rrects, angle_version).astype(np.float32)


def rotated_box_to_bbox(rrects):
    """obb -> enclosing hbb via its polygon (reference box_ops.py:691-697)."""
    xp = _xp(rrects)
    poly = rotated_box_to_poly(rrects, best_begin=False)
    xs = poly[..., 0::2]
    ys = poly[..., 1::2]
    return xp.stack(
        [xs.min(-1), ys.min(-1), xs.max(-1), ys.max(-1)], axis=-1
    )


def rotated_box_to_bbox_np(rrects):
    rrects = np.asarray(rrects, dtype=np.float32)
    if rrects.shape[0] == 0:
        return np.zeros((0, 4), np.float32), np.zeros((0, 8), np.float32)
    polys = rotated_box_to_poly_np(rrects)
    xs, ys = polys[:, 0::2], polys[:, 1::2]
    hbb = np.stack(
        [xs.min(1), ys.min(1), xs.max(1), ys.max(1)], axis=1
    ).astype(np.float32)
    return hbb, polys


# ---------------------------------------------------------------------------
# OBBDetection-convention conversions (Oriented R-CNN path).
# These use the opposite angle sign: obb2poly() here rotates by
# R = [[cos, sin], [-sin, cos]] (reference bbox_transforms.py:610-655).
# ---------------------------------------------------------------------------

def obb2poly(obboxes):
    xp = _xp(obboxes)
    cx, cy, w, h, theta = (obboxes[..., i] for i in range(5))
    c, s = xp.cos(theta), xp.sin(theta)
    v1x, v1y = w / 2 * c, -w / 2 * s
    v2x, v2y = -h / 2 * s, -h / 2 * c
    px = xp.stack([cx + v1x + v2x, cx + v1x - v2x,
                   cx - v1x - v2x, cx - v1x + v2x], axis=-1)
    py = xp.stack([cy + v1y + v2y, cy + v1y - v2y,
                   cy - v1y - v2y, cy - v1y + v2y], axis=-1)
    return xp.stack([px, py], axis=-1).reshape(*obboxes.shape[:-1], 8)


def obb2hbb(obboxes):
    xp = _xp(obboxes)
    cx, cy, w, h, theta = (obboxes[..., i] for i in range(5))
    c, s = xp.cos(theta), xp.sin(theta)
    xb = xp.abs(w / 2 * c) + xp.abs(h / 2 * s)
    yb = xp.abs(w / 2 * s) + xp.abs(h / 2 * c)
    return xp.stack([cx - xb, cy - yb, cx + xb, cy + yb], axis=-1)


def hbb2obb(hbboxes):
    """hbb -> obb with w >= h enforced (bbox_transforms.py:644-656)."""
    xp = _xp(hbboxes)
    x = (hbboxes[..., 0] + hbboxes[..., 2]) * 0.5
    y = (hbboxes[..., 1] + hbboxes[..., 3]) * 0.5
    w = hbboxes[..., 2] - hbboxes[..., 0]
    h = hbboxes[..., 3] - hbboxes[..., 1]
    zeros = xp.zeros_like(x)
    wide = w >= h
    return xp.stack(
        [x, y,
         xp.where(wide, w, h),
         xp.where(wide, h, w),
         xp.where(wide, zeros, zeros - HALF_PI)],
        axis=-1,
    )


def hbb2poly(hbboxes):
    xp = _xp(hbboxes)
    l, t, r, b = (hbboxes[..., i] for i in range(4))
    return xp.stack([l, t, r, t, r, b, l, b], axis=-1)


def poly2hbb(polys):
    xp = _xp(polys)
    pts = polys.reshape(*polys.shape[:-1], polys.shape[-1] // 2, 2)
    lt = pts.min(axis=-2)
    rb = pts.max(axis=-2)
    return xp.concatenate([lt, rb], axis=-1)


def rectpoly2obb(polys):
    """Rectangular polygon -> obb, OBBDetection convention.

    theta from the first edge (y negated), then rotate all points into
    that frame and take extents (bbox_transforms.py:578-608).
    """
    xp = _xp(polys)
    theta = xp.arctan2(-(polys[..., 3] - polys[..., 1]),
                       polys[..., 2] - polys[..., 0])
    c, s = xp.cos(theta), xp.sin(theta)
    x = polys[..., 0::2].mean(-1)
    y = polys[..., 1::2].mean(-1)
    pts = polys.reshape(*polys.shape[:-1], 4, 2)
    relx = pts[..., 0] - x[..., None]
    rely = pts[..., 1] - y[..., None]
    # rotate by R^T where R = [[c, -s], [s, c]]  (matmul with Matrix.T)
    rx = relx * c[..., None] - rely * s[..., None]
    ry = relx * s[..., None] + rely * c[..., None]
    w = rx.max(-1) - rx.min(-1)
    h = ry.max(-1) - ry.min(-1)
    return regular_obb(xp.stack([x, y, w, h, theta], axis=-1))


def poly2obb(polys):
    """General quad -> obb. Closed-form replacement for the reference's
    cv2.minAreaRect round-trip (bbox_transforms.py:549-576); exact for
    rectangular polys (the only inputs on the inference path)."""
    obb = poly_to_rotated_box(polys, angle_version="le90")
    return regular_obb(obb)


def get_bbox_type(bboxes, with_score: bool = False) -> str:
    dim = bboxes.shape[-1] - (1 if with_score else 0)
    return {4: "hbb", 5: "obb", 8: "poly"}.get(dim, "notype")


def get_bbox_dim(bbox_type: str, with_score: bool = False) -> int:
    dim = {"hbb": 4, "obb": 5, "poly": 8}[bbox_type]
    return dim + (1 if with_score else 0)


def bbox2type(bboxes, to_type: str):
    ori = get_bbox_type(bboxes)
    if ori == to_type:
        return bboxes
    table = {
        ("poly", "obb"): poly2obb,
        ("poly", "hbb"): poly2hbb,
        ("obb", "poly"): obb2poly,
        ("obb", "hbb"): obb2hbb,
        ("hbb", "poly"): hbb2poly,
        ("hbb", "obb"): hbb2obb,
    }
    return table[(ori, to_type)](bboxes)


def get_bbox_areas(bboxes):
    xp = _xp(bboxes)
    btype = get_bbox_type(bboxes)
    if btype == "hbb":
        return ((bboxes[..., 2] - bboxes[..., 0])
                * (bboxes[..., 3] - bboxes[..., 1]))
    if btype == "obb":
        return bboxes[..., 2] * bboxes[..., 3]
    pts = bboxes.reshape(*bboxes.shape[:-1], 4, 2)
    rolled = xp.roll(pts, 1, axis=-2)
    cross = (pts[..., 0] * rolled[..., 1]
             - rolled[..., 0] * pts[..., 1]).sum(-1)
    return 0.5 * xp.abs(cross)


# ---------------------------------------------------------------------------
# Delta coder math
# ---------------------------------------------------------------------------

_EPS = 1e-6


def _safe_log(xp, x):
    return xp.log(xp.maximum(x, _EPS))


def bbox2delta(proposals, gt, means=None, stds=None):
    """hbb encode, legacy +1 w/h convention (box_ops.py:292-344)."""
    xp = _xp(proposals, gt)
    px = (proposals[..., 0] + proposals[..., 2]) * 0.5
    py = (proposals[..., 1] + proposals[..., 3]) * 0.5
    pw = proposals[..., 2] - proposals[..., 0] + 1.0
    ph = proposals[..., 3] - proposals[..., 1] + 1.0
    gx = (gt[..., 0] + gt[..., 2]) * 0.5
    gy = (gt[..., 1] + gt[..., 3]) * 0.5
    gw = gt[..., 2] - gt[..., 0] + 1.0
    gh = gt[..., 3] - gt[..., 1] + 1.0
    deltas = xp.stack(
        [(gx - px) / pw, (gy - py) / ph,
         _safe_log(xp, gw / pw), _safe_log(xp, gh / ph)],
        axis=-1,
    )
    if means is not None and stds is not None:
        deltas = (deltas - xp.asarray(means)) / xp.asarray(stds)
    return deltas


def delta2bbox(rois, deltas, means=None, stds=None, max_shape=None,
               wh_ratio_clip=16 / 1000):
    """hbb decode (box_ops.py:346-437). ``deltas`` may be [..., 4*K]."""
    xp = _xp(rois, deltas)
    if means is not None and stds is not None:
        k = deltas.shape[-1] // 4
        means_t = xp.tile(xp.asarray(means, dtype=deltas.dtype), k)
        stds_t = xp.tile(xp.asarray(stds, dtype=deltas.dtype), k)
        deltas = deltas * stds_t + means_t
    dx = deltas[..., 0::4]
    dy = deltas[..., 1::4]
    max_ratio = abs(math.log(wh_ratio_clip))
    dw = xp.clip(deltas[..., 2::4], -max_ratio, max_ratio)
    dh = xp.clip(deltas[..., 3::4], -max_ratio, max_ratio)
    px = ((rois[..., 0] + rois[..., 2]) * 0.5)[..., None]
    py = ((rois[..., 1] + rois[..., 3]) * 0.5)[..., None]
    pw = (rois[..., 2] - rois[..., 0])[..., None]
    ph = (rois[..., 3] - rois[..., 1])[..., None]
    gw = pw * xp.exp(dw)
    gh = ph * xp.exp(dh)
    gx = px + pw * dx
    gy = py + ph * dy
    x1, y1 = gx - gw * 0.5, gy - gh * 0.5
    x2, y2 = gx + gw * 0.5, gy + gh * 0.5
    if max_shape is not None:
        x1 = xp.clip(x1, 0, max_shape[1] - 1)
        y1 = xp.clip(y1, 0, max_shape[0] - 1)
        x2 = xp.clip(x2, 0, max_shape[1] - 1)
        y2 = xp.clip(y2, 0, max_shape[0] - 1)
    # [..., K, 4] -> [..., 4*K] (matches input layout for any K incl. 1)
    return xp.stack([x1, y1, x2, y2], axis=-1).reshape(deltas.shape)


def bbox2delta_rotated(proposals, gt,
                       means=(0., 0., 0., 0., 0.),
                       stds=(1., 1., 1., 1., 1.)):
    """obb encode in the proposal's rotated frame (box_ops.py:184-230)."""
    xp = _xp(proposals, gt)
    pw, ph, pa = proposals[..., 2], proposals[..., 3], proposals[..., 4]
    gw, gh, ga = gt[..., 2], gt[..., 3], gt[..., 4]
    cosa, sina = xp.cos(pa), xp.sin(pa)
    ox = gt[..., 0] - proposals[..., 0]
    oy = gt[..., 1] - proposals[..., 1]
    dx = (cosa * ox + sina * oy) / pw
    dy = (-sina * ox + cosa * oy) / ph
    dw = _safe_log(xp, gw / pw)
    dh = _safe_log(xp, gh / ph)
    da = norm_angle(ga - pa) / PI
    deltas = xp.stack([dx, dy, dw, dh, da], axis=-1)
    return (deltas - xp.asarray(means)) / xp.asarray(stds)


def delta2bbox_rotated(rois, deltas,
                       means=(0., 0., 0., 0., 0.),
                       stds=(1., 1., 1., 1., 1.),
                       max_shape=None, wh_ratio_clip=16 / 1000,
                       clip_border=True):
    """obb decode (box_ops.py:233-289). ``deltas`` may be [N, 5*K]."""
    xp = _xp(rois, deltas)
    k = deltas.shape[-1] // 5
    means_t = xp.tile(xp.asarray(means, dtype=deltas.dtype), k)
    stds_t = xp.tile(xp.asarray(stds, dtype=deltas.dtype), k)
    d = deltas * stds_t + means_t
    dx, dy = d[..., 0::5], d[..., 1::5]
    max_ratio = abs(math.log(wh_ratio_clip))
    dw = xp.clip(d[..., 2::5], -max_ratio, max_ratio)
    dh = xp.clip(d[..., 3::5], -max_ratio, max_ratio)
    dangle = d[..., 4::5]
    rx = rois[..., 0][..., None]
    ry = rois[..., 1][..., None]
    rw = rois[..., 2][..., None]
    rh = rois[..., 3][..., None]
    ra = rois[..., 4][..., None]
    gx = dx * rw * xp.cos(ra) - dy * rh * xp.sin(ra) + rx
    gy = dx * rw * xp.sin(ra) + dy * rh * xp.cos(ra) + ry
    gw = rw * xp.exp(dw)
    gh = rh * xp.exp(dh)
    ga = norm_angle(PI * dangle + ra)
    # [..., K, 5] -> [..., 5*K] (matches input layout for any K incl. 1)
    return xp.stack([gx, gy, gw, gh, ga], axis=-1).reshape(deltas.shape)


def distance2obb(points, distance, max_shape=None):
    """FCOS decode: 4 edge distances + theta -> obb (box_ops.py:735-748)."""
    xp = _xp(points, distance)
    dist, theta = distance[..., :4], distance[..., 4]
    c, s = xp.cos(theta), xp.sin(theta)
    wh_w = dist[..., 0] + dist[..., 2]
    wh_h = dist[..., 1] + dist[..., 3]
    ox = (dist[..., 2] - dist[..., 0]) / 2
    oy = (dist[..., 3] - dist[..., 1]) / 2
    # offset rotated by [[cos, sin], [-sin, cos]]
    cx = points[..., 0] + c * ox + s * oy
    cy = points[..., 1] - s * ox + c * oy
    return regular_obb(xp.stack([cx, cy, wh_w, wh_h, theta], axis=-1))


# ---------------------------------------------------------------------------
# roi packing helpers (bbox_transforms.py:470-499)
# ---------------------------------------------------------------------------

def bbox2roi(bbox_list):
    """List of per-image [N_i, 4+] boxes -> [sum N_i, 1+dim] rois with a
    leading batch-index column (host-side / static shapes)."""
    xp = _xp(*bbox_list) if bbox_list else np
    rois = []
    for img_id, bboxes in enumerate(bbox_list):
        idx = xp.full((bboxes.shape[0], 1), float(img_id),
                      dtype=bboxes.dtype)
        rois.append(xp.concatenate([idx, bboxes[:, :4]], axis=-1))
    return xp.concatenate(rois, axis=0)


def arb2roi(bbox_list, bbox_dim: int = 5):
    xp = _xp(*bbox_list) if bbox_list else np
    rois = []
    for img_id, bboxes in enumerate(bbox_list):
        idx = xp.full((bboxes.shape[0], 1), float(img_id),
                      dtype=bboxes.dtype)
        rois.append(xp.concatenate([idx, bboxes[:, :bbox_dim]], axis=-1))
    return xp.concatenate(rois, axis=0)
