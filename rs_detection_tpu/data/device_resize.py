"""On-device bicubic resize with cv2.INTER_CUBIC semantics.

The reference's multi-scale recipe resizes each scene with
``cv2.resize(..., interpolation=cv2.INTER_CUBIC)`` before tiling
(``ImgSplit_multi_process.py:263-266``, rates 0.5/1.0/1.5). For raw-
scene serving the resize must run on device, and ``jax.image.resize``
uses the Keys a=-0.5 kernel (PIL-style) — NOT cv2's a=-0.75 — so it
cannot reproduce the reference tiles. This module implements the exact
cv2 mapping as two separable 4-tap gather-and-combine passes:

* sample position ``src = (dst + 0.5) * (in/out) - 0.5``;
* 4 taps at ``floor(src)-1 .. +2``, border-replicated (clip);
* Keys cubic weights with ``a = -0.75`` (cv2's fixed choice).

Index/weight tables are built host-side per (in, out) pair (static
shapes), so the device work is two gathers + weighted sums that XLA
fuses; validated against ``cv2.resize`` to ~1e-4 on f32
(tests/test_device_resize.py).
"""

from __future__ import annotations

import functools

import numpy as np


def _cubic_kernel(t: np.ndarray, a: float = -0.75) -> np.ndarray:
    """Keys cubic convolution kernel (cv2 uses a=-0.75)."""
    t = np.abs(t)
    out = np.where(
        t <= 1.0, (a + 2.0) * t ** 3 - (a + 3.0) * t ** 2 + 1.0,
        np.where(t < 2.0,
                 a * t ** 3 - 5.0 * a * t ** 2 + 8.0 * a * t - 4.0 * a,
                 0.0))
    return out


@functools.lru_cache(maxsize=64)
def _tap_tables(n_in: int, n_out: int):
    """(idx [n_out, 4] int32, weights [n_out, 4] f32) for one axis."""
    scale = n_in / n_out
    dst = np.arange(n_out, dtype=np.float64)
    src = (dst + 0.5) * scale - 0.5
    i0 = np.floor(src).astype(np.int64)
    frac = src - i0
    idx = np.stack([np.clip(i0 + k - 1, 0, n_in - 1)
                    for k in range(4)], axis=1)
    dist = np.stack([1.0 + frac, frac, 1.0 - frac, 2.0 - frac], axis=1)
    wts = _cubic_kernel(dist)
    return idx.astype(np.int32), wts.astype(np.float32)


def resize_cubic(img, out_h: int, out_w: int):
    """Resize [H, W, C] to [out_h, out_w, C] on device, f32 output,
    exactly reproducing ``cv2.resize(img, (out_w, out_h),
    interpolation=cv2.INTER_CUBIC)`` on float inputs (uint8 callers:
    cast/saturate afterwards if byte output is needed)."""
    import jax.numpy as jnp

    h, w = int(img.shape[0]), int(img.shape[1])
    if (h, w) == (out_h, out_w):
        return img.astype(jnp.float32)
    iy, wy = _tap_tables(h, out_h)
    ix, wx = _tap_tables(w, out_w)
    x = img.astype(jnp.float32)
    # rows: [out_h, 4, W, C] taps -> weighted sum over taps
    xr = jnp.einsum("okwc,ok->owc", x[jnp.asarray(iy)],
                    jnp.asarray(wy))
    # cols: [out_h, out_w, 4, C]
    xc = jnp.einsum("hokc,ok->hoc", xr[:, jnp.asarray(ix)],
                    jnp.asarray(wx))
    return xc
