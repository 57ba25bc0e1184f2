"""RoIAlign — horizontal and rotated — with static shapes.

Capability parity with the reference CUDA kernels:
  * ``roi_align`` — ``python/jdet/ops/roi_align.py:209-301``
  * ``roi_align_rotated`` — ``python/jdet/ops/roi_align_rotated_v1.py``
    (OBBDetection convention, the one used by ``OrientedHead``) and
    ``roi_align_rotated.py`` (legacy convention).

TPU-first: features are NHWC, all rois are padded to a fixed count with
a validity column; sampling is a fixed ``sampling_ratio**2`` grid per
bin (the reference's adaptive ``ceil(roi/pool)`` mode is data-dependent
and would force recompilation — configs of record use
``sampling_ratio=2``, see ``configs/orcnn_van3_7_anchor_swa_1.py:87``).
Bilinear gathers differentiate through XLA gather/scatter.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .sampling import bilinear_sample


def _bin_grid(pooled: int, ratio: int, start, bin_size):
    """Sample coordinates for all bins: [pooled * ratio] along one axis."""
    p = jnp.arange(pooled, dtype=jnp.float32)
    g = (jnp.arange(ratio, dtype=jnp.float32) + 0.5) / ratio
    # [pooled, ratio] -> flat
    return (start + p[:, None] * bin_size + g[None, :] * bin_size).reshape(-1)


@functools.partial(jax.jit,
                   static_argnames=("output_size", "sampling_ratio"))
def roi_align_rotated(features, rois, output_size: int,
                      spatial_scale: float, sampling_ratio: int = 2):
    """Rotated RoIAlign (v1 / OBBDetection convention).

    Args:
      features: [N, H, W, C]
      rois: [R, 6] = (batch_idx, cx, cy, w, h, theta) in image coords.
      output_size: pooled size P.
      spatial_scale: feature stride reciprocal.
      sampling_ratio: samples per bin side (static; > 0 required).

    Returns:
      [R, P, P, C] pooled features.

    Rotation math matches ``roi_align_rotated_v1.py:132-135``:
    ``x = xx*cos + yy*sin + cx; y = yy*cos - xx*sin + cy``.
    """
    assert sampling_ratio > 0, "static sampling_ratio required on TPU"
    p = output_size
    s = sampling_ratio

    def one_roi(roi):
        b = roi[0].astype(jnp.int32)
        cx = roi[1] * spatial_scale - 0.5
        cy = roi[2] * spatial_scale - 0.5
        rw = jnp.maximum(roi[3] * spatial_scale, 1.0)
        rh = jnp.maximum(roi[4] * spatial_scale, 1.0)
        theta = roi[5]
        bin_w = rw / p
        bin_h = rh / p
        xx = _bin_grid(p, s, -rw / 2.0, bin_w)          # [P*s]
        yy = _bin_grid(p, s, -rh / 2.0, bin_h)          # [P*s]
        xxg = xx[None, :]                                # [1, P*s]
        yyg = yy[:, None]                                # [P*s, 1]
        ct, st = jnp.cos(theta), jnp.sin(theta)
        x = xxg * ct + yyg * st + cx                     # [P*s, P*s]
        y = yyg * ct - xxg * st + cy
        feat = jnp.take(features, b, axis=0)             # [H, W, C]
        vals = bilinear_sample(feat, y, x)               # [P*s, P*s, C]
        vals = vals.reshape(p, s, p, s, -1)
        return vals.mean(axis=(1, 3))                    # [P, P, C]

    return jax.vmap(one_roi)(rois.astype(jnp.float32))


@functools.partial(jax.jit,
                   static_argnames=("output_size", "sampling_ratio"))
def roi_align(features, rois, output_size: int, spatial_scale: float,
              sampling_ratio: int = 2):
    """Horizontal RoIAlign (torchvision-style, non-legacy coords).

    Args:
      features: [N, H, W, C]; rois: [R, 5] = (batch_idx, x1, y1, x2, y2).

    Parity: ``roi_align.py:95-140`` (aligned=False branch:
    ``width = max(x2*s - x1*s, 1)``).
    """
    assert sampling_ratio > 0
    p = output_size
    s = sampling_ratio

    def one_roi(roi):
        b = roi[0].astype(jnp.int32)
        x1 = roi[1] * spatial_scale
        y1 = roi[2] * spatial_scale
        rw = jnp.maximum(roi[3] * spatial_scale - x1, 1.0)
        rh = jnp.maximum(roi[4] * spatial_scale - y1, 1.0)
        x = _bin_grid(p, s, x1, rw / p)
        y = _bin_grid(p, s, y1, rh / p)
        feat = jnp.take(features, b, axis=0)
        vals = bilinear_sample(feat, y[:, None], x[None, :])
        vals = vals.reshape(p, s, p, s, -1)
        return vals.mean(axis=(1, 3))

    return jax.vmap(one_roi)(rois.astype(jnp.float32))


class ROIAlign:
    """Module-style wrapper (reference ``roi_align.py:268``)."""

    def __init__(self, output_size, spatial_scale, sampling_ratio=2):
        self.output_size = (output_size if isinstance(output_size, int)
                            else output_size[0])
        self.spatial_scale = spatial_scale
        self.sampling_ratio = max(int(sampling_ratio), 1)

    def __call__(self, features, rois):
        return roi_align(features, rois, self.output_size,
                         self.spatial_scale, self.sampling_ratio)


class ROIAlignRotated:
    """Module-style wrapper (reference ``roi_align_rotated_v1.py:300``)."""

    def __init__(self, output_size, spatial_scale, sampling_ratio=2):
        self.output_size = (output_size if isinstance(output_size, int)
                            else output_size[0])
        self.spatial_scale = spatial_scale
        self.sampling_ratio = max(int(sampling_ratio), 1)

    def __call__(self, features, rois):
        return roi_align_rotated(features, rois, self.output_size,
                                 self.spatial_scale, self.sampling_ratio)


# The v1 suffix mirrors the reference's dual conventions; the math here
# already follows v1 (the one on the Oriented R-CNN hot path).
ROIAlignRotated_v1 = ROIAlignRotated


@functools.partial(jax.jit, static_argnames=("output_size",))
def roi_pool(features, rois, output_size: int, spatial_scale: float):
    """Max RoIPool (reference ``roi_pool.py:141``), via dense max over a
    fixed 4x supersampled grid per bin (static-shape approximation of
    the exact integer-cell max; exact for bins >= 4 px)."""
    p = output_size
    s = 4

    def one_roi(roi):
        b = roi[0].astype(jnp.int32)
        x1 = jnp.round(roi[1] * spatial_scale)
        y1 = jnp.round(roi[2] * spatial_scale)
        x2 = jnp.round(roi[3] * spatial_scale)
        y2 = jnp.round(roi[4] * spatial_scale)
        rw = jnp.maximum(x2 - x1 + 1, 1.0)
        rh = jnp.maximum(y2 - y1 + 1, 1.0)
        x = _bin_grid(p, s, x1, rw / p)
        y = _bin_grid(p, s, y1, rh / p)
        feat = jnp.take(features, b, axis=0)
        vals = bilinear_sample(feat, y[:, None], x[None, :])
        vals = vals.reshape(p, s, p, s, -1)
        return vals.max(axis=(1, 3))

    return jax.vmap(one_roi)(rois.astype(jnp.float32))
