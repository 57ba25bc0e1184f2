"""Exact skew (rotated-box) IoU — the assignment hot path.

Capability parity with the reference CUDA kernels
(``python/jdet/ops/box_iou_rotated.py:502``,
``box_iou_rotated_v1.py:507``): exact IoU of (cx, cy, w, h, theta)
boxes via vertex enumeration -> pairwise segment intersections
(<= 24 candidate points) -> angular sort around the centroid ->
shoelace area.

TPU-first design: everything is fixed-shape and branch-free — the
24-point candidate buffer is dense with a validity mask, the convex
intersection polygon's area is a masked triangle fan, and the [N, M]
matrix is computed in row blocks via ``lax.map`` so peak memory stays
bounded regardless of anchor count. Runs entirely on the VPU under jit;
no host fallback needed.

IoU is invariant to the y-axis reflection that separates the JDet and
OBBDetection angle conventions (both boxes reflect together), so one
geometric core serves both ``box_iou_rotated`` and
``box_iou_rotated_v1`` call sites.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_EPS_DENOM = 1e-14
_EPS_AREA = 1e-14


def _corners(boxes):
    """[..., 5] obb -> [..., 4, 2] corners (JDet convention)."""
    cx, cy, w, h, t = (boxes[..., i] for i in range(5))
    c, s = jnp.cos(t), jnp.sin(t)
    dx = w * 0.5
    dy = h * 0.5
    lx = jnp.stack([-dx, dx, dx, -dx], axis=-1)
    ly = jnp.stack([-dy, -dy, dy, dy], axis=-1)
    px = c[..., None] * lx - s[..., None] * ly + cx[..., None]
    py = s[..., None] * lx + c[..., None] * ly + cy[..., None]
    return jnp.stack([px, py], axis=-1)


def _cross(ox, oy, ax, ay, bx, by):
    return (ax - ox) * (by - oy) - (ay - oy) * (bx - ox)


def _intersection_area(c1, c2):
    """Area of intersection of two convex quads given as [4, 2] corners."""
    # --- candidate points 1: segment-segment intersections (16) ---
    p1 = c1                      # [4, 2] segment starts of quad 1
    p2 = jnp.roll(c1, -1, 0)     # segment ends
    q1 = c2
    q2 = jnp.roll(c2, -1, 0)
    # broadcast to [4, 4]
    p1x, p1y = p1[:, None, 0], p1[:, None, 1]
    p2x, p2y = p2[:, None, 0], p2[:, None, 1]
    q1x, q1y = q1[None, :, 0], q1[None, :, 1]
    q2x, q2y = q2[None, :, 0], q2[None, :, 1]
    d1x, d1y = p2x - p1x, p2y - p1y
    d2x, d2y = q2x - q1x, q2y - q1y
    denom = d1x * d2y - d1y * d2x
    safe = jnp.abs(denom) > _EPS_DENOM
    denom_s = jnp.where(safe, denom, 1.0)
    rx, ry = q1x - p1x, q1y - p1y
    t = (rx * d2y - ry * d2x) / denom_s
    s = (rx * d1y - ry * d1x) / denom_s
    hit = safe & (t >= 0.0) & (t <= 1.0) & (s >= 0.0) & (s <= 1.0)
    ix = p1x + t * d1x
    iy = p1y + t * d1y
    inter_pts = jnp.stack([ix.reshape(16), iy.reshape(16)], axis=-1)
    inter_mask = hit.reshape(16)

    # --- candidate points 2: corners of each quad inside the other (8) ---
    def _inside(pts, quad):
        # point is inside a convex quad iff all edge cross products share
        # the sign of the quad's orientation
        a = quad
        b = jnp.roll(quad, -1, 0)
        cr = _cross(a[None, :, 0], a[None, :, 1],
                    b[None, :, 0], b[None, :, 1],
                    pts[:, None, 0], pts[:, None, 1])
        orient = _cross(quad[0, 0], quad[0, 1], quad[1, 0], quad[1, 1],
                        quad[2, 0], quad[2, 1])
        return jnp.where(orient >= 0, (cr >= -1e-8).all(-1),
                         (cr <= 1e-8).all(-1))

    in1 = _inside(c1, c2)
    in2 = _inside(c2, c1)

    pts = jnp.concatenate([inter_pts, c1, c2], axis=0)        # [24, 2]
    mask = jnp.concatenate([inter_mask, in1, in2], axis=0)    # [24]

    k = mask.sum()
    # centroid of valid points
    cen = (pts * mask[:, None]).sum(0) / jnp.maximum(k, 1)
    v = pts - cen
    ang = jnp.arctan2(v[:, 1], v[:, 0])
    ang = jnp.where(mask, ang, 1e9)  # invalid sorted last
    order = jnp.argsort(ang)
    v = v[order]
    m = mask[order]
    # triangle fan: pairs (i, i+1) both valid cover 0..k-2; wraparound
    # (23, 0) only applies when all 24 are valid; otherwise add the
    # closing term (k-1, 0) explicitly.
    v_next = jnp.roll(v, -1, 0)
    m_next = jnp.roll(m, -1, 0)
    terms = (v[:, 0] * v_next[:, 1] - v[:, 1] * v_next[:, 0]) * (m & m_next)
    fan = terms.sum()
    last = jnp.clip(k - 1, 0, 23)
    closing = v[last, 0] * v[0, 1] - v[last, 1] * v[0, 0]
    fan = fan + jnp.where(k < 24, closing, 0.0)
    area = 0.5 * jnp.abs(fan)
    return jnp.where(k >= 3, area, 0.0)


def _pair_iou(b1, b2, mode: str = "iou"):
    """IoU of a single pair of obbs ([5], [5]) -> scalar."""
    area1 = b1[2] * b1[3]
    area2 = b2[2] * b2[3]
    inter = _intersection_area(_corners(b1), _corners(b2))
    if mode == "iou":
        denom = area1 + area2 - inter
    else:  # "iof": intersection over the first box
        denom = area1
    iou = inter / jnp.maximum(denom, _EPS_AREA)
    valid = (area1 > _EPS_AREA) & (area2 > _EPS_AREA) if mode == "iou" \
        else (area1 > _EPS_AREA)
    return jnp.where(valid, jnp.clip(iou, 0.0, 1.0), 0.0)


@functools.partial(jax.jit, static_argnames=("mode", "row_block"))
def box_iou_rotated(boxes1, boxes2, mode: str = "iou", row_block: int = 512):
    """Pairwise exact rotated IoU matrix.

    Args:
      boxes1: [N, 5] (cx, cy, w, h, theta)
      boxes2: [M, 5]
      mode: "iou" or "iof" (intersection over boxes1 areas)
      row_block: boxes1 rows processed per step to bound peak memory
        (24-point buffers are [row_block, M, 24, 2]).

    Returns:
      [N, M] float32 IoU matrix.

    Parity: reference ``ops/box_iou_rotated.py:502`` /
    ``box_iou_rotated_v1.py:507`` (conventions coincide for IoU values).
    """
    n, m = boxes1.shape[0], boxes2.shape[0]
    if n == 0 or m == 0:
        return jnp.zeros((n, m), jnp.float32)
    boxes1 = boxes1.astype(jnp.float32)
    boxes2 = boxes2.astype(jnp.float32)

    row_fn = jax.vmap(jax.vmap(
        lambda a, b: _pair_iou(a, b, mode), in_axes=(None, 0)),
        in_axes=(0, None))

    if n <= row_block:
        return row_fn(boxes1, boxes2)

    pad = (-n) % row_block
    padded = jnp.pad(boxes1, ((0, pad), (0, 0)))
    blocks = padded.reshape(-1, row_block, 5)
    out = jax.lax.map(lambda blk: row_fn(blk, boxes2), blocks)
    return out.reshape(-1, m)[:n]


def box_iou_rotated_v1(boxes1, boxes2, mode: str = "iou", **kw):
    """mmrotate/OBBDetection-convention entry point; IoU values coincide
    with :func:`box_iou_rotated` (see module docstring)."""
    return box_iou_rotated(boxes1, boxes2, mode=mode, **kw)


@functools.partial(jax.jit, static_argnames=("mode",))
def poly_iou(polys1, polys2, mode: str = "iou"):
    """Pairwise exact IoU of convex quadrilaterals ([N, 8] x [M, 8]).

    Shares the geometric core; parity with ``ops/nms_poly.py:247``
    (``iou_poly``). Non-convex inputs are treated by their vertex hull.
    """
    n, m = polys1.shape[0], polys2.shape[0]
    if n == 0 or m == 0:
        return jnp.zeros((n, m), jnp.float32)
    c1 = polys1.astype(jnp.float32).reshape(n, 4, 2)
    c2 = polys2.astype(jnp.float32).reshape(m, 4, 2)

    def _quad_area(c):
        nxt = jnp.roll(c, -1, 0)
        return 0.5 * jnp.abs(
            (c[:, 0] * nxt[:, 1] - nxt[:, 0] * c[:, 1]).sum())

    def pair(a, b):
        inter = _intersection_area(a, b)
        a1 = _quad_area(a)
        a2 = _quad_area(b)
        denom = a1 + a2 - inter if mode == "iou" else a1
        return jnp.where(denom > _EPS_AREA,
                         jnp.clip(inter / jnp.maximum(denom, _EPS_AREA),
                                  0.0, 1.0),
                         0.0)

    return jax.vmap(jax.vmap(pair, in_axes=(None, 0)), in_axes=(0, None))(
        c1, c2)
