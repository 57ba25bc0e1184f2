"""Exact skew (rotated-box) IoU — the assignment hot path.

Capability parity with the reference CUDA kernels
(``python/jdet/ops/box_iou_rotated.py:502``,
``box_iou_rotated_v1.py:507``): exact IoU of (cx, cy, w, h, theta)
boxes via vertex enumeration -> pairwise segment intersections
(<= 24 candidate points) -> angular sort around the centroid ->
shoelace area.

TPU-first design: the PAIR dimension is the minor (lane) dimension of
every intermediate — the small geometric dims (4 corners, 16 segment
pairs, 24 candidates) are unrolled in Python so all device arrays are
``[P]`` vectors or ``[24, P]`` stacks. The naive vmap-of-scalar-pair
formulation puts those small dims minor, and TPU tiling pads them to
128 lanes (a 64x physical blowup on the ``[..., 2]`` point buffers):
measured 48 ms for a 4x[2048, 8] assigner batch vs ~1 ms lane-major.
The angular sort is one multi-operand ``lax.sort`` along the
24-candidate (sublane) axis — no argsort + gather. The [N, M] matrix
is computed in flattened pair blocks via ``lax.map`` so peak memory
stays bounded regardless of size. Runs entirely on the VPU under jit.

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

# pairs per lax.map block: ~600 B of [24, P] intermediates per pair
# keeps peak extra memory ~150 MB
_PAIR_BLOCK = 262144


def _corners_comp(boxes):
    """[P, 5] obb -> (x, y) corner components, each [4, P] (JDet
    convention, same corner order as the reference kernels)."""
    cx, cy, w, h, t = (boxes[:, i] for i in range(5))
    c, s = jnp.cos(t), jnp.sin(t)
    dx, dy = w * 0.5, h * 0.5
    xs, ys = [], []
    for sx, sy in ((-1.0, -1.0), (1.0, -1.0), (1.0, 1.0), (-1.0, 1.0)):
        lx, ly = sx * dx, sy * dy
        xs.append(c * lx - s * ly + cx)
        ys.append(s * lx + c * ly + cy)
    return jnp.stack(xs, 0), jnp.stack(ys, 0)


def _inside(ptx, pty, qx, qy):
    """[P] point components inside the convex quad given by [4, P]
    corner components (sign-consistent edge cross products)."""
    pos = None
    neg = None
    for j in range(4):
        ax, ay = qx[j], qy[j]
        bx, by = qx[(j + 1) % 4], qy[(j + 1) % 4]
        cr = (bx - ax) * (pty - ay) - (by - ay) * (ptx - ax)
        p, q = cr >= -1e-8, cr <= 1e-8
        pos = p if pos is None else pos & p
        neg = q if neg is None else neg & q
    orient = ((qx[1] - qx[0]) * (qy[2] - qy[0])
              - (qy[1] - qy[0]) * (qx[2] - qx[0]))
    return jnp.where(orient >= 0, pos, neg)


def _inter_area_comp(x1, y1, x2, y2):
    """Intersection area of two convex quads from [4, P] corner
    components -> [P]."""
    px, py, pm = [], [], []
    # candidate points 1: the 16 segment-segment intersections
    for i in range(4):
        p1x, p1y = x1[i], y1[i]
        p2x, p2y = x1[(i + 1) % 4], y1[(i + 1) % 4]
        d1x, d1y = p2x - p1x, p2y - p1y
        for j in range(4):
            q1x, q1y = x2[j], y2[j]
            q2x, q2y = x2[(j + 1) % 4], y2[(j + 1) % 4]
            d2x, d2y = q2x - q1x, q2y - q1y
            denom = d1x * d2y - d1y * d2x
            safe = jnp.abs(denom) > _EPS_DENOM
            dn = jnp.where(safe, denom, 1.0)
            rx, ry = q1x - p1x, q1y - p1y
            t = (rx * d2y - ry * d2x) / dn
            s = (rx * d1y - ry * d1x) / dn
            # small tolerance on the unit-parameter window: for
            # coincident quads every intersection sits exactly at a
            # segment endpoint, and XLA fusion/FMA reordering can
            # perturb t/s an ulp past the boundary (observed: jit
            # dropped half the boundary points of an identical-box
            # pair while eager kept them). The emitted point is
            # clamped onto the segment, so the area effect of the
            # tolerance is O(1e-5 * edge length).
            tol = 1e-5
            hit = safe & (t >= -tol) & (t <= 1.0 + tol) \
                & (s >= -tol) & (s <= 1.0 + tol)
            tc = jnp.clip(t, 0.0, 1.0)
            px.append(p1x + tc * d1x)
            py.append(p1y + tc * d1y)
            pm.append(hit)
    # candidate points 2: corners of each quad inside the other
    for i in range(4):
        px.append(x1[i])
        py.append(y1[i])
        pm.append(_inside(x1[i], y1[i], x2, y2))
    for i in range(4):
        px.append(x2[i])
        py.append(y2[i])
        pm.append(_inside(x2[i], y2[i], x1, y1))

    ptx = jnp.stack(px, 0)                               # [24, P]
    pty = jnp.stack(py, 0)
    m = jnp.stack(pm, 0)
    k = m.sum(0)                                         # [P]
    mf = m.astype(ptx.dtype)
    inv = 1.0 / jnp.maximum(k, 1)
    cenx = (ptx * mf).sum(0) * inv
    ceny = (pty * mf).sum(0) * inv
    vx = ptx - cenx
    vy = pty - ceny
    ang = jnp.where(m, jnp.arctan2(vy, vx), 1e9)         # invalid last
    # one multi-operand sort along the candidate (sublane) axis carries
    # the point components with the angle key
    _, vx, vy, mf = jax.lax.sort((ang, vx, vy, mf), dimension=0,
                                 num_keys=1)
    ms = mf > 0.5
    # triangle fan: pairs (i, i+1) both valid cover 0..k-2; wraparound
    # (23, 0) only applies when all 24 are valid; otherwise add the
    # closing term (k-1, 0) explicitly.
    vnx = jnp.roll(vx, -1, 0)
    vny = jnp.roll(vy, -1, 0)
    mn = jnp.roll(ms, -1, 0)
    fan = ((vx * vny - vy * vnx) * (ms & mn)).sum(0)
    last = jnp.clip(k - 1, 0, 23)
    sel = (jnp.arange(24, dtype=jnp.int32)[:, None] == last[None, :]) \
        .astype(vx.dtype)
    vlx = (vx * sel).sum(0)
    vly = (vy * sel).sum(0)
    fan = fan + jnp.where(k < 24, vlx * vy[0] - vly * vx[0], 0.0)
    area = 0.5 * jnp.abs(fan)
    return jnp.where(k >= 3, area, 0.0)


def _pair_iou_flat(b1, b2, mode: str = "iou"):
    """IoU of aligned obb pairs: [P, 5] x [P, 5] -> [P]."""
    x1, y1 = _corners_comp(b1)
    x2, y2 = _corners_comp(b2)
    inter = _inter_area_comp(x1, y1, x2, y2)
    area1 = b1[:, 2] * b1[:, 3]
    area2 = b2[:, 2] * b2[:, 3]
    if mode == "iou":
        denom = area1 + area2 - inter
        valid = (area1 > _EPS_AREA) & (area2 > _EPS_AREA)
    else:  # "iof": intersection over the first box
        denom = area1
        valid = area1 > _EPS_AREA
    iou = inter / jnp.maximum(denom, _EPS_AREA)
    return jnp.where(valid, jnp.clip(iou, 0.0, 1.0), 0.0)


def _matrix_blocked(pair_fn, boxes1, boxes2, m_cols: int,
                    row_block: int):
    """[N, ...] x [M, ...] -> [N, M] via flattened pair blocks."""
    n = boxes1.shape[0]
    if n <= row_block:
        return pair_fn(boxes1, boxes2)
    pad = (-n) % row_block
    padded = jnp.pad(boxes1, ((0, pad),) + ((0, 0),) * (boxes1.ndim - 1))
    blocks = padded.reshape((-1, row_block) + boxes1.shape[1:])
    out = jax.lax.map(lambda blk: pair_fn(blk, boxes2), blocks)
    return out.reshape(-1, m_cols)[:n]


@functools.partial(jax.jit, static_argnames=("mode", "row_block"))
def box_iou_rotated(boxes1, boxes2, mode: str = "iou",
                    row_block: int = 0):
    """Pairwise exact rotated IoU matrix.

    Args:
      boxes1: [N, 5] (cx, cy, w, h, theta)
      boxes2: [M, 5]
      mode: "iou" or "iof" (intersection over boxes1 areas)
      row_block: boxes1 rows per ``lax.map`` step (0 = derive from the
        ~_PAIR_BLOCK flattened-pair budget).

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
    if row_block <= 0:
        row_block = max(1, _PAIR_BLOCK // m)

    def pair_fn(b1_blk, b2_all):
        nb = b1_blk.shape[0]
        b1p = jnp.broadcast_to(b1_blk[:, None, :], (nb, m, 5)) \
            .reshape(nb * m, 5)
        b2p = jnp.broadcast_to(b2_all[None, :, :], (nb, m, 5)) \
            .reshape(nb * m, 5)
        return _pair_iou_flat(b1p, b2p, mode).reshape(nb, m)

    return _matrix_blocked(pair_fn, boxes1, boxes2, m, row_block)


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

    def pair_fn(c1_blk, c2_all):
        nb = c1_blk.shape[0]
        p1 = jnp.broadcast_to(c1_blk[:, None], (nb, m, 4, 2)) \
            .reshape(nb * m, 4, 2)
        p2 = jnp.broadcast_to(c2_all[None], (nb, m, 4, 2)) \
            .reshape(nb * m, 4, 2)
        x1 = tuple(p1[:, i, 0] for i in range(4))
        y1 = tuple(p1[:, i, 1] for i in range(4))
        x2 = tuple(p2[:, i, 0] for i in range(4))
        y2 = tuple(p2[:, i, 1] for i in range(4))

        def shoelace(xs, ys):
            s = None
            for i in range(4):
                t = (xs[i] * ys[(i + 1) % 4] - xs[(i + 1) % 4] * ys[i])
                s = t if s is None else s + t
            return 0.5 * jnp.abs(s)

        inter = _inter_area_comp(x1, y1, x2, y2)
        a1 = shoelace(x1, y1)
        a2 = shoelace(x2, y2)
        denom = a1 + a2 - inter if mode == "iou" else a1
        out = jnp.where(denom > _EPS_AREA,
                        jnp.clip(inter / jnp.maximum(denom, _EPS_AREA),
                                 0.0, 1.0),
                        0.0)
        return out.reshape(nb, m)

    row_block = max(1, _PAIR_BLOCK // m)
    return _matrix_blocked(pair_fn, c1, c2, m, row_block)
