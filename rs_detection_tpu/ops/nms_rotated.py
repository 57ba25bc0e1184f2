"""Rotated NMS with static shapes (jit) + eager wrappers.

Capability parity with the reference CUDA bitmask NMS
(``python/jdet/ops/nms_rotated.py:285-609``): ``nms_rotated``,
``ml_nms_rotated`` (class-aware), and ``multiclass_nms_rotated``.

TPU-first: the jit path computes the score-sorted exact-IoU matrix with
the shared skew-IoU core (bounded-memory row blocks) and runs a
branch-free greedy suppression scan; candidates are padded/masked, never
dynamically filtered, so everything compiles once. ``multiclass_nms_rotated_jit``
is the in-graph version used by compiled detection heads: it takes a
static candidate cap ``pre_nms`` and returns fixed-size (dets, labels,
valid) instead of dynamically-sized tensors.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .nms import _greedy_suppress
from .rotated_iou import box_iou_rotated


@functools.partial(jax.jit, static_argnames=())
def nms_rotated_mask(dets, scores, iou_threshold, valid=None, labels=None):
    """Keep mask (input order) for rotated NMS.

    Args:
      dets: [N, 5] obbs; scores: [N]; valid: optional [N] bool;
      labels: optional [N] int — when given, suppression only applies
        within the same label (``ml_nms_rotated`` semantics).
    """
    n = dets.shape[0]
    if valid is None:
        valid = jnp.ones((n,), bool)
    s = jnp.where(valid, scores, -jnp.inf)
    order = jnp.argsort(-s)
    b = dets[order, :5]
    iou = box_iou_rotated(b, b)
    if labels is not None:
        lab = labels[order]
        iou = jnp.where(lab[:, None] == lab[None, :], iou, 0.0)
    keep_sorted = _greedy_suppress(iou, valid[order], iou_threshold)
    return jnp.zeros((n,), bool).at[order].set(keep_sorted)


def nms_rotated(dets, scores, iou_threshold):
    """Eager: kept indices, score-descending (reference ``:527``)."""
    dets = np.asarray(dets, np.float32)
    scores = np.asarray(scores, np.float32)
    if dets.shape[0] == 0:
        return np.zeros((0,), np.int64)
    keep = np.asarray(nms_rotated_mask(jnp.asarray(dets),
                                       jnp.asarray(scores), iou_threshold))
    idx = np.nonzero(keep)[0]
    return idx[np.argsort(-scores[idx])]


def ml_nms_rotated(dets, scores, labels, iou_threshold):
    """Eager class-aware variant (reference ``:515``)."""
    dets = np.asarray(dets, np.float32)
    scores = np.asarray(scores, np.float32)
    labels = np.asarray(labels)
    if dets.shape[0] == 0:
        return np.zeros((0,), np.int64)
    keep = np.asarray(nms_rotated_mask(
        jnp.asarray(dets), jnp.asarray(scores), iou_threshold,
        labels=jnp.asarray(labels)))
    idx = np.nonzero(keep)[0]
    return idx[np.argsort(-scores[idx])]


@functools.partial(jax.jit, static_argnames=("pre_nms", "max_num"))
def multiclass_nms_rotated_jit(multi_bboxes, multi_scores, score_thr,
                               iou_thr, pre_nms: int = 2000,
                               max_num: int = 2000,
                               score_factors=None):
    """In-graph multiclass rotated NMS with fixed output size.

    Args:
      multi_bboxes: [N, 5] or [N, C*5] obbs (class-agnostic or per-class
        regression). C excludes background.
      multi_scores: [N, C+1] with background scores in column 0
        (reference convention, ``nms_rotated.py:540-596``).
      score_thr: scalar score floor.
      iou_thr: NMS IoU threshold.
      pre_nms: static cap of candidates entering NMS (top-k over the
        flattened N*C score table).
      max_num: static output size.

    Returns:
      dets [max_num, 6] (obb + score), labels [max_num] (0-based, -1 for
      padding), valid [max_num] bool.
    """
    n = multi_scores.shape[0]
    num_classes = multi_scores.shape[1] - 1
    scores = multi_scores[:, 1:]                            # [N, C]
    if score_factors is not None:
        scores = scores * score_factors[:, None]
    if multi_bboxes.shape[1] > 5:
        bboxes = multi_bboxes.reshape(n, -1, 5)[:, 1:]      # [N, C, 5]
    else:
        bboxes = jnp.broadcast_to(multi_bboxes[:, None, :],
                                  (n, num_classes, 5))
    flat_scores = scores.reshape(-1)                        # [N*C]
    flat_boxes = bboxes.reshape(-1, 5)
    flat_labels = jnp.tile(jnp.arange(num_classes), n)
    ok = flat_scores > score_thr

    k = min(pre_nms, flat_scores.shape[0])
    top_scores, top_idx = jax.lax.top_k(
        jnp.where(ok, flat_scores, -jnp.inf), k)
    cand_boxes = flat_boxes[top_idx]
    cand_labels = flat_labels[top_idx]
    cand_valid = top_scores > score_thr

    keep = nms_rotated_mask(cand_boxes, top_scores, iou_thr,
                            valid=cand_valid, labels=cand_labels)
    kept_scores = jnp.where(keep, top_scores, -jnp.inf)
    out_scores, sel = jax.lax.top_k(kept_scores, min(max_num, k))
    out_boxes = cand_boxes[sel]
    out_valid = jnp.isfinite(out_scores)
    out_labels = jnp.where(out_valid, cand_labels[sel], -1)
    dets = jnp.concatenate(
        [out_boxes, jnp.where(out_valid, out_scores, 0.0)[:, None]], axis=1)
    if max_num > k:
        padn = max_num - k
        dets = jnp.pad(dets, ((0, padn), (0, 0)))
        out_labels = jnp.pad(out_labels, (0, padn), constant_values=-1)
        out_valid = jnp.pad(out_valid, (0, padn))
    return dets, out_labels, out_valid


def multiclass_nms_rotated(multi_bboxes, multi_scores, score_thr, nms_cfg,
                           max_num=-1, score_factors=None):
    """Eager reference-compatible wrapper: returns dynamically-sized
    (dets [k, 6], labels [k]) like the reference (``:540-596``)."""
    iou_thr = dict(nms_cfg).get("iou_thr", 0.1)
    n = int(multi_scores.shape[0])
    if n == 0:
        return np.zeros((0, 6), np.float32), np.zeros((0,), np.int64)
    cap = max_num if max_num > 0 else 2000
    dets, labels, valid = multiclass_nms_rotated_jit(
        jnp.asarray(multi_bboxes), jnp.asarray(multi_scores),
        float(score_thr), float(iou_thr),
        pre_nms=min(2000, n * (multi_scores.shape[1] - 1)),
        max_num=cap,
        score_factors=None if score_factors is None
        else jnp.asarray(score_factors))
    valid = np.asarray(valid)
    return np.asarray(dets)[valid], np.asarray(labels)[valid]
