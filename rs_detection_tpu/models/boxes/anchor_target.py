"""Anchor targeting: assign + sample + encode, dense and static-shape.

Capability parity with the reference pipeline
(``python/jdet/models/boxes/anchor_target.py:18-195``): per-image
assignment, sampling, delta encoding, inside-border filtering, and the
level split (``images_to_levels``).

TPU-first reformulation (SURVEY §7 "hardest parts" #1): no boolean
filtering anywhere —
  * GTs come padded to [MAX_GT] with a mask;
  * out-of-border anchors are excluded via ``anchor_mask`` (they cannot
    become negatives nor win rescue matches — identical to the
    reference's remove + ``unmap`` round trip);
  * sampling produces weight masks, so outputs are dense [A] / [A, D]
    arrays ready for per-level reshaping;
  * the whole thing vmaps over the batch dimension.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp

from .assigner import MaxIoUAssigner
from .sampler import PseudoSampler, RandomSampler


class AnchorTargetResult(NamedTuple):
    labels: jnp.ndarray          # [A] int32 (0 = bg, k>0 = class id)
    label_weights: jnp.ndarray   # [A] float
    bbox_targets: jnp.ndarray    # [A, D]
    bbox_weights: jnp.ndarray    # [A, D]
    num_pos: jnp.ndarray         # [] int32
    num_neg: jnp.ndarray         # [] int32
    assigned_gt_inds: jnp.ndarray  # [A] int32 (-1/0/k+1)


def anchor_inside_flags(flat_anchors, valid_flags, img_shape,
                        allowed_border=-1):
    """hbb anchors within the (possibly padded) image border
    (reference ``anchor_target.py:184-195``)."""
    if allowed_border < 0:
        return valid_flags
    img_h, img_w = img_shape
    return (valid_flags
            & (flat_anchors[:, 0] >= -allowed_border)
            & (flat_anchors[:, 1] >= -allowed_border)
            & (flat_anchors[:, 2] < img_w + allowed_border)
            & (flat_anchors[:, 3] < img_h + allowed_border))


def anchor_target_single(anchors: jnp.ndarray,
                         inside_mask: jnp.ndarray,
                         gt_bboxes: jnp.ndarray,
                         gt_mask: jnp.ndarray,
                         gt_labels: Optional[jnp.ndarray],
                         assigner: MaxIoUAssigner,
                         sampler,
                         encode_fn,
                         key: Optional[jax.Array] = None,
                         pos_weight: float = -1.0,
                         gt_bboxes_ignore=None,
                         gt_ignore_mask=None,
                         gt_bboxes_encode=None) -> AnchorTargetResult:
    """One image. ``encode_fn(anchors, gts) -> deltas`` decides D.

    Parity: ``anchor_target_single`` (reference ``:105-180``) with the
    dense-mask reformulation described in the module docstring.
    """
    assigned, _ = assigner.assign(
        anchors, gt_bboxes, gt_mask,
        gt_bboxes_ignore=gt_bboxes_ignore, gt_ignore_mask=gt_ignore_mask,
        anchor_mask=inside_mask)

    if isinstance(sampler, PseudoSampler) or key is None:
        pos_mask, neg_mask = PseudoSampler().sample(assigned)
    else:
        pos_mask, neg_mask = sampler.sample(assigned, key)

    # dense encode: every anchor against its (clamped) matched gt.
    # ``gt_bboxes_encode`` lets assignment and encoding use different
    # box types (RPN assigns on the gt's hbb but encodes the obb —
    # reference oriented_rpn_head.py:300-316).
    matched = jnp.clip(assigned - 1, 0, gt_bboxes.shape[0] - 1)
    encode_gts = gt_bboxes if gt_bboxes_encode is None else gt_bboxes_encode
    g = encode_gts.shape[0]
    if g <= 128:
        # one-hot contraction instead of a per-anchor row gather: TPU
        # gathers are issue-bound (~7 ns/row — 17 ms/step for the
        # 611k-anchor RPN at batch 4) while the [A, G] one-hot einsum
        # against a tiny GT table fuses into one cheap pass
        onehot = matched[:, None] == jnp.arange(g, dtype=matched.dtype)
        # HIGHEST precision: the default MXU dot would round the f32
        # GT table to bf16 and quantize every regression target
        matched_gts = jnp.einsum(
            "ag,gd->ad", onehot.astype(encode_gts.dtype), encode_gts,
            precision=jax.lax.Precision.HIGHEST)
    else:
        onehot = None
        matched_gts = encode_gts[matched]
    targets = encode_fn(anchors, matched_gts)
    d = targets.shape[-1]
    bbox_weights = jnp.where(pos_mask[:, None],
                             jnp.ones((1, d), targets.dtype), 0.0)
    bbox_targets = jnp.where(pos_mask[:, None], targets, 0.0)

    if gt_labels is None:
        labels = jnp.where(pos_mask, 1, 0).astype(jnp.int32)
    else:
        if onehot is not None:
            matched_labels = (onehot * gt_labels[None, :].astype(
                jnp.int32)).sum(axis=1)
        else:
            matched_labels = gt_labels[matched]
        labels = jnp.where(pos_mask, matched_labels, 0).astype(jnp.int32)
    pw = 1.0 if pos_weight <= 0 else pos_weight
    label_weights = jnp.where(pos_mask, pw,
                              jnp.where(neg_mask, 1.0, 0.0))

    return AnchorTargetResult(
        labels=labels,
        label_weights=label_weights.astype(jnp.float32),
        bbox_targets=bbox_targets,
        bbox_weights=bbox_weights.astype(jnp.float32),
        num_pos=pos_mask.sum().astype(jnp.int32),
        num_neg=neg_mask.sum().astype(jnp.int32),
        assigned_gt_inds=assigned,
    )


def images_to_levels(target: jnp.ndarray,
                     num_level_anchors: Sequence[int]):
    """[B, A, ...] -> list of per-level [B, A_l, ...]
    (reference ``anchor_target.py:91-102``)."""
    out = []
    start = 0
    for n in num_level_anchors:
        out.append(target[:, start:start + n])
        start += n
    return out
