"""Shared bilinear sampling core used by RoIAlign (h + rotated),
deformable conv, and the feature-refine module.

Semantics exactly match the reference CUDA ``bilinear_interpolate``
(``python/jdet/ops/roi_align_rotated_v1.py:24-68``): points outside
``(-1, H)`` x ``(-1, W)`` contribute zero; coordinates clamp to 0 on the
low side and to the last pixel on the high side. Gradients flow through
XLA's gather/scatter autodiff — no hand-written backward needed.
"""

from __future__ import annotations

import jax.numpy as jnp


def bilinear_sample_zeros(feat: jnp.ndarray, y: jnp.ndarray,
                          x: jnp.ndarray):
    """Bilinear sample with zero-padding semantics (deformable conv).

    Each of the four neighbors contributes its bilinear weight only if
    it is in bounds — matching the reference ``deformable_im2col``
    bilinear (``python/jdet/ops/dcn_v1.py``), i.e. ordinary conv
    zero-padding at the borders.
    """
    h, w = feat.shape[0], feat.shape[1]
    y0 = jnp.floor(y)
    x0 = jnp.floor(x)
    ly = (y - y0)[..., None]
    lx = (x - x0)[..., None]
    y0i = y0.astype(jnp.int32)
    x0i = x0.astype(jnp.int32)
    out = 0.0
    for dy, wy in ((0, 1.0 - ly), (1, ly)):
        for dx, wx in ((0, 1.0 - lx), (1, lx)):
            yy = y0i + dy
            xx = x0i + dx
            ok = ((yy >= 0) & (yy < h) & (xx >= 0) & (xx < w))[..., None]
            v = feat[jnp.clip(yy, 0, h - 1), jnp.clip(xx, 0, w - 1)]
            out = out + jnp.where(ok, wy * wx * v, 0.0)
    return out


def bilinear_sample(feat: jnp.ndarray, y: jnp.ndarray, x: jnp.ndarray):
    """Sample [H, W, C] features at fractional (y, x) points.

    Args:
      feat: [H, W, C]
      y, x: arbitrary (matching) shapes of sample coordinates.

    Returns:
      [..., C] sampled values (0 outside the valid border band).
    """
    h, w = feat.shape[0], feat.shape[1]
    oob = (y < -1.0) | (y > h) | (x < -1.0) | (x > w)
    y = jnp.maximum(y, 0.0)
    x = jnp.maximum(x, 0.0)
    y_low = y.astype(jnp.int32)
    x_low = x.astype(jnp.int32)
    yc = y_low >= h - 1
    xc = x_low >= w - 1
    y_low = jnp.where(yc, h - 1, y_low)
    x_low = jnp.where(xc, w - 1, x_low)
    y_high = jnp.where(yc, h - 1, y_low + 1)
    x_high = jnp.where(xc, w - 1, x_low + 1)
    y = jnp.where(yc, y_low.astype(y.dtype), y)
    x = jnp.where(xc, x_low.astype(x.dtype), x)

    ly = (y - y_low.astype(y.dtype))[..., None]
    lx = (x - x_low.astype(x.dtype))[..., None]
    hy = 1.0 - ly
    hx = 1.0 - lx

    v1 = feat[y_low, x_low]
    v2 = feat[y_low, x_high]
    v3 = feat[y_high, x_low]
    v4 = feat[y_high, x_high]
    out = hy * hx * v1 + hy * lx * v2 + ly * hx * v3 + ly * lx * v4
    return jnp.where(oob[..., None], 0.0, out)
