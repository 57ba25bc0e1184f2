"""convex_sort: order masked point sets CCW around their centroid.

Capability parity with the reference op
(``python/jdet/ops/convex_sort.py:196``; CPU qsort / GPU bubble sort),
used by the differentiable polygon IoU losses
(``models/losses/poly_iou_loss.py``).

TPU-first: a single masked argsort by angle — no sorting network
needed; invalid points sort last.
"""

from __future__ import annotations

import jax.numpy as jnp


def convex_sort(pts: jnp.ndarray, masks: jnp.ndarray,
                circular: bool = True) -> jnp.ndarray:
    """Args:
      pts: [B, N, 2] candidate points.
      masks: [B, N] validity.
      circular: append the first valid index at the end (closing the
        ring) as the reference does.

    Returns:
      [B, N(+1)] int32 indices ordering valid points CCW by angle around
      the masked centroid; invalid slots are -1.
    """
    masks = masks.astype(bool)
    b, n = masks.shape
    cnt = jnp.maximum(masks.sum(-1, keepdims=True), 1)
    cen = (pts * masks[..., None]).sum(-2) / cnt
    rel = pts - cen[:, None, :]
    ang = jnp.arctan2(rel[..., 1], rel[..., 0])
    ang = jnp.where(masks, ang, jnp.inf)
    order = jnp.argsort(ang, axis=-1).astype(jnp.int32)
    valid_sorted = jnp.take_along_axis(masks, order, axis=-1)
    order = jnp.where(valid_sorted, order, -1)
    if circular:
        # the ring-closing duplicate of the first valid index must sit
        # IMMEDIATELY after the last valid entry: downstream shoelace
        # consumers replace -1 slots with a zero point whose cross
        # terms vanish, so the closing edge has to be adjacent
        order = jnp.concatenate(
            [order, jnp.full((b, 1), -1, jnp.int32)], axis=-1)
        k = masks.sum(-1).astype(jnp.int32)         # [B]
        first = order[..., 0]
        order = order.at[jnp.arange(b), k].set(
            jnp.where(k > 0, first, -1))
    return order
