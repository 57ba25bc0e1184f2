"""Feature refinement (R3Det): re-sample features at refined-box
anchor points and add them back.

Capability parity with the reference inline-CUDA FR op
(``python/jdet/ops/fr.py:234-348``): per spatial location, bilinearly
sample the feature map at the refined rbox's center (points=1) or
center + 4 corners (points=5) and add to the original feature.

TPU-first: one fused gather over the whole [N, H, W] grid; backward is
XLA's scatter-add via autodiff (replacing the hand-written atomicAdd
kernel).

Note: the reference kernel reads ``roi_y`` from ``bbox[0]`` and
``roi_x`` from ``bbox[1]`` (fr.py:133-135) — i.e. its ``best_bboxes``
buffers are (y, x, w, h, a)-ordered at the kernel boundary. Here boxes
are plain (cx, cy, w, h, theta); producers and consumers in this repo
agree on that layout.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .sampling import bilinear_sample


@functools.partial(jax.jit, static_argnames=("points",))
def feature_refine(features, best_rbboxes, spatial_scale: float,
                   points: int = 1):
    """Args:
      features: [N, H, W, C].
      best_rbboxes: [N, H, W, 5] refined (cx, cy, w, h, theta) per cell.

    Returns:
      [N, H, W, C] = features + sum of sampled points.
    """
    assert points in (1, 5)

    def per_image(feat, boxes):
        cx = boxes[..., 0] * spatial_scale
        cy = boxes[..., 1] * spatial_scale
        acc = bilinear_sample(feat, cy, cx)
        if points == 5:
            w2 = boxes[..., 2] * spatial_scale / 2.0
            h2 = boxes[..., 3] * spatial_scale / 2.0
            a = boxes[..., 4]
            cosa, sina = jnp.cos(a), jnp.sin(a)
            wx, wy = cosa * w2, sina * w2
            hx, hy = -sina * h2, cosa * h2
            for sx, sy in ((1, 1), (-1, 1), (-1, -1), (1, -1)):
                px = cx + sx * wx + sy * hx
                py = cy + sx * wy + sy * hy
                acc = acc + bilinear_sample(feat, py, px)
        return feat + acc

    return jax.vmap(per_image)(features, best_rbboxes)
