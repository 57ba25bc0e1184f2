"""Horizontal-box NMS (replaces the reference's ``jt.nms`` builtin,
``python/jdet/ops/nms.py``).

TPU-native design: fixed shapes, mask semantics. ``nms_mask`` is the
jit path used inside compiled proposal generation; ``nms`` is the
eager/indices convenience wrapper.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def bbox_overlaps_hbb(boxes1, boxes2, mode: str = "iou", offset: float = 0.0):
    """Pairwise hbb IoU: [N, 4] x [M, 4] -> [N, M]."""
    xp = jnp if isinstance(boxes1, jnp.ndarray) else np
    tl = xp.maximum(boxes1[:, None, :2], boxes2[None, :, :2])
    br = xp.minimum(boxes1[:, None, 2:4], boxes2[None, :, 2:4])
    wh = xp.clip(br - tl + offset, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    area1 = ((boxes1[:, 2] - boxes1[:, 0] + offset)
             * (boxes1[:, 3] - boxes1[:, 1] + offset))
    if mode == "iof":
        denom = area1[:, None]
    else:
        area2 = ((boxes2[:, 2] - boxes2[:, 0] + offset)
                 * (boxes2[:, 3] - boxes2[:, 1] + offset))
        denom = area1[:, None] + area2[None, :] - inter
    return xp.where(denom > 0, inter / xp.where(denom > 0, denom, 1.0), 0.0)


def overlap_gt_mask_hbb(boxes: jnp.ndarray, thresh,
                        offset: float = 0.0) -> jnp.ndarray:
    """Pairwise boolean ``iou > thresh`` for hbbs WITHOUT materializing
    the f32 IoU matrix: ``inter/(a1+a2-inter) > t`` is rewritten
    division-free as ``inter*(1+t) > t*(a1+a2)``, and every pairwise
    intermediate is a scalar-component expression (no trailing
    ``[N, N, 2]`` stack), so XLA emits ONE fused pass whose only output
    is the packed bool matrix — at RPN scale ([8, 4096, 4096]) this
    saves a 537 MB f32 intermediate round-trip per image batch."""
    x1, y1, x2, y2 = (boxes[..., :, k] for k in range(4))
    ix = (jnp.minimum(x2[..., :, None], x2[..., None, :])
          - jnp.maximum(x1[..., :, None], x1[..., None, :]) + offset)
    iy = (jnp.minimum(y2[..., :, None], y2[..., None, :])
          - jnp.maximum(y1[..., :, None], y1[..., None, :]) + offset)
    inter = jnp.clip(ix, 0, None) * jnp.clip(iy, 0, None)
    area = (x2 - x1 + offset) * (y2 - y1 + offset)
    return inter * (1.0 + thresh) > thresh * (
        area[..., :, None] + area[..., None, :])


def _greedy_suppress_mask(over: jnp.ndarray, order_valid: jnp.ndarray
                          ) -> jnp.ndarray:
    """Greedy NMS from a boolean pairwise-overlap matrix ``over``
    (``iou > thresh``) of score-sorted boxes — see ``_greedy_suppress``
    for the Jacobi-fixpoint design notes."""
    n = over.shape[0]
    lower = jnp.tril(jnp.ones((n, n), bool), k=-1).T
    m = over & lower & order_valid[:, None] & order_valid[None, :]

    def cond(state):
        keep, prev, it = state
        return jnp.any(keep != prev) & (it < n)

    def body(state):
        keep, _, it = state
        sup = jnp.any(m & keep[:, None], axis=0)
        return order_valid & jnp.logical_not(sup), keep, it + 1

    init = (order_valid, jnp.zeros((n,), bool), jnp.asarray(0))
    keep, _, _ = jax.lax.while_loop(cond, body, init)
    return keep


def _greedy_suppress(iou: jnp.ndarray, order_valid: jnp.ndarray,
                     thresh: float) -> jnp.ndarray:
    """Greedy suppression over score-sorted boxes, TPU-parallel.

    ``iou`` is the [N, N] matrix of the *sorted* boxes; returns a keep
    mask in sorted order producing EXACTLY the sequential greedy NMS
    result. Greedy NMS is a lower-triangular boolean recurrence
    (``keep_i = valid_i and no kept j<i overlaps i``); instead of an
    N-step sequential scan (catastrophic on TPU — thousands of tiny
    control-flow steps), we run Jacobi fixpoint iterations of the
    whole system: each sweep is one vectorized [N, N] masked reduction
    on the VPU, and after t sweeps every box whose suppression-chain
    depth is <= t has stabilized. Chains are short in practice (< 10),
    and the while_loop exits exactly at convergence, so this is both
    exact and ~3 orders of magnitude fewer sequential steps.
    """
    return _greedy_suppress_mask(iou > thresh, order_valid)


@functools.partial(jax.jit, static_argnames=())
def nms_mask(boxes, scores, iou_threshold, valid=None):
    """Keep mask (input order) for hbb NMS with static shapes.

    Args:
      boxes: [N, 4]; scores: [N]; valid: optional [N] bool mask for
        padded entries (treated as score -inf).
    """
    n = boxes.shape[0]
    if valid is None:
        valid = jnp.ones((n,), bool)
    s = jnp.where(valid, scores, -jnp.inf)
    order = jnp.argsort(-s)
    b = boxes[order]
    iou = bbox_overlaps_hbb(b, b)
    keep_sorted = _greedy_suppress(iou, valid[order], iou_threshold)
    keep = jnp.zeros((n,), bool).at[order].set(keep_sorted)
    return keep


def nms(boxes, scores, iou_threshold):
    """Eager helper: returns kept indices sorted by descending score
    (reference ``ops/nms.py:4``)."""
    boxes = np.asarray(boxes, np.float32)
    scores = np.asarray(scores, np.float32)
    if boxes.shape[0] == 0:
        return np.zeros((0,), np.int64)
    keep = np.asarray(nms_mask(jnp.asarray(boxes), jnp.asarray(scores),
                               iou_threshold))
    idx = np.nonzero(keep)[0]
    return idx[np.argsort(-scores[idx])]


def multiclass_nms(mlvl_bboxes, mlvl_scores, score_thr, nms_cfg, max_num=-1):
    """Per-class hbb NMS (reference ``ops/nms.py:11``), eager."""
    num_classes = mlvl_scores.shape[1]
    out_boxes, out_labels = [], []
    iou_thr = nms_cfg.get("iou_thr", 0.5)
    for c in range(num_classes):
        mask = mlvl_scores[:, c] > score_thr
        if not mask.any():
            continue
        boxes_c = mlvl_bboxes[mask]
        scores_c = mlvl_scores[mask, c]
        keep = nms(boxes_c, scores_c, iou_thr)
        dets = np.concatenate([boxes_c[keep], scores_c[keep, None]], 1)
        out_boxes.append(dets)
        out_labels.append(np.full((len(keep),), c, np.int64))
    if not out_boxes:
        return np.zeros((0, 5), np.float32), np.zeros((0,), np.int64)
    dets = np.concatenate(out_boxes, 0)
    labels = np.concatenate(out_labels, 0)
    order = np.argsort(-dets[:, 4])
    if max_num > 0:
        order = order[:max_num]
    return dets[order], labels[order]


def fast_top_k(scores: jnp.ndarray, k: int):
    """Top-k tuned for TPU: ``lax.approx_max_k`` (no full sort) for
    large candidate sets, exact ``lax.top_k`` for small ones. Used for
    pre-NMS candidate selection where approximate recall@k is
    indistinguishable (candidates are re-ranked by NMS anyway)."""
    n = scores.shape[-1]
    if n > 16384:
        return jax.lax.approx_max_k(scores, k)
    return jax.lax.top_k(scores, k)
