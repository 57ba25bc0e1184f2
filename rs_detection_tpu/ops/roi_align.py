"""RoIAlign — horizontal and rotated — with static shapes.

Capability parity with the reference CUDA kernels:
  * ``roi_align`` — ``python/jdet/ops/roi_align.py:209-301``
  * ``roi_align_rotated`` — ``python/jdet/ops/roi_align_rotated_v1.py``
    (OBBDetection convention, the one used by ``OrientedHead``) and
    ``roi_align_rotated.py`` (legacy convention).

TPU-first: features are NHWC; rois are padded to a fixed count with a
validity column; sampling is a fixed ``sampling_ratio**2`` grid per bin
(the reference's adaptive ``ceil(roi/pool)`` mode is data-dependent and
would force recompilation — configs of record use ``sampling_ratio=2``,
``configs/orcnn_van3_7_anchor_swa_1.py:87``).

Memory-critical design point: the batch dimension is folded into the
gather rows (features flattened to [N*H, W, C], sample row indices
offset by ``batch_idx * H``) so XLA emits ONE gather of exactly the
sampled points — never a per-roi copy of the feature map (a naive
vmap-over-rois take would materialize [R, H, W, C]). Gradients flow
through XLA's gather/scatter autodiff.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _bin_centers(p: int, s: int):
    """[p*s] normalized bin-sample positions in units of bin size."""
    pp = jnp.arange(p, dtype=jnp.float32)
    g = (jnp.arange(s, dtype=jnp.float32) + 0.5) / s
    return (pp[:, None] + g[None, :]).reshape(-1)  # in bins


def _batched_bilinear(features: jnp.ndarray, b_idx: jnp.ndarray,
                      y: jnp.ndarray, x: jnp.ndarray):
    """Bilinear sample [N, H, W, C] at per-roi points.

    Args:
      b_idx: [R] int32 batch index per roi.
      y, x: [R, G, G] sample coordinates (feature scale).

    Returns [R, G, G, C]. Border semantics match the reference CUDA
    ``bilinear_interpolate`` (roi_align_rotated_v1.py:24-68).
    """
    n, h, w, c = features.shape
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

    flat = features.reshape(n * h, w, c)
    row = (b_idx * h)[:, None, None]

    def g(yi, xi):
        return flat[row + yi, xi]          # [R, G, G, C] gather

    out = (hy * hx * g(y_low, x_low) + hy * lx * g(y_low, x_high)
           + ly * hx * g(y_high, x_low) + ly * lx * g(y_high, x_high))
    return jnp.where(oob[..., None], 0.0, out)


@functools.partial(jax.jit,
                   static_argnames=("output_size", "sampling_ratio"))
def roi_align_rotated(features, rois, output_size: int,
                      spatial_scale: float, sampling_ratio: int = 2):
    """Rotated RoIAlign (v1 / OBBDetection convention).

    Args:
      features: [N, H, W, C]; rois: [R, 6] (batch_idx, cx, cy, w, h,
      theta) in image coords.

    Returns [R, P, P, C]. Rotation matches
    ``roi_align_rotated_v1.py:132-135``: ``x = xx*cos + yy*sin + cx;
    y = yy*cos - xx*sin + cy`` with the 0.5-pixel center offset.
    """
    assert sampling_ratio > 0, "static sampling_ratio required on TPU"
    p, s = output_size, sampling_ratio
    rois = rois.astype(jnp.float32)
    b_idx = rois[:, 0].astype(jnp.int32)
    cx = rois[:, 1] * spatial_scale - 0.5
    cy = rois[:, 2] * spatial_scale - 0.5
    rw = jnp.maximum(rois[:, 3] * spatial_scale, 1.0)
    rh = jnp.maximum(rois[:, 4] * spatial_scale, 1.0)
    theta = rois[:, 5]
    grid = _bin_centers(p, s)                           # [P*s]
    xx = (grid[None, :] / p - 0.5) * rw[:, None]        # [R, P*s]
    yy = (grid[None, :] / p - 0.5) * rh[:, None]
    ct = jnp.cos(theta)[:, None, None]
    st = jnp.sin(theta)[:, None, None]
    xg = xx[:, None, :]                                 # [R, 1, P*s]
    yg = yy[:, :, None]                                 # [R, P*s, 1]
    x = xg * ct + yg * st + cx[:, None, None]
    y = yg * ct - xg * st + cy[:, None, None]
    vals = _batched_bilinear(features, b_idx, y, x)     # [R, G, G, C]
    vals = vals.reshape(vals.shape[0], p, s, p, s, -1)
    return vals.mean(axis=(2, 4))


@functools.partial(jax.jit,
                   static_argnames=("output_size", "sampling_ratio"))
def roi_align(features, rois, output_size: int, spatial_scale: float,
              sampling_ratio: int = 2):
    """Horizontal RoIAlign (torchvision-style, non-legacy coords);
    rois [R, 5] = (batch_idx, x1, y1, x2, y2). Parity:
    ``roi_align.py:95-140`` (``width = max(x2*s - x1*s, 1)``)."""
    assert sampling_ratio > 0
    p, s = output_size, sampling_ratio
    rois = rois.astype(jnp.float32)
    b_idx = rois[:, 0].astype(jnp.int32)
    x1 = rois[:, 1] * spatial_scale
    y1 = rois[:, 2] * spatial_scale
    rw = jnp.maximum(rois[:, 3] * spatial_scale - x1, 1.0)
    rh = jnp.maximum(rois[:, 4] * spatial_scale - y1, 1.0)
    grid = _bin_centers(p, s) / p                        # [P*s] in [0,1)
    x = x1[:, None, None] + (grid[None, None, :] * rw[:, None, None])
    y = y1[:, None, None] + (grid[None, :, None] * rh[:, None, None])
    x = jnp.broadcast_to(x, (rois.shape[0], p * s, p * s))
    y = jnp.broadcast_to(y, (rois.shape[0], p * s, p * s))
    vals = _batched_bilinear(features, b_idx, y, x)
    vals = vals.reshape(vals.shape[0], p, s, p, s, -1)
    return vals.mean(axis=(2, 4))


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


ROIAlignRotated_v1 = ROIAlignRotated


@functools.partial(jax.jit, static_argnames=("output_size",))
def roi_pool(features, rois, output_size: int, spatial_scale: float):
    """Max RoIPool (reference ``roi_pool.py:141``), via a fixed 4x
    supersampled max per bin (static-shape approximation of the exact
    integer-cell max; exact for bins >= 4 px)."""
    p, s = output_size, 4
    rois = rois.astype(jnp.float32)
    b_idx = rois[:, 0].astype(jnp.int32)
    x1 = jnp.round(rois[:, 1] * spatial_scale)
    y1 = jnp.round(rois[:, 2] * spatial_scale)
    x2 = jnp.round(rois[:, 3] * spatial_scale)
    y2 = jnp.round(rois[:, 4] * spatial_scale)
    rw = jnp.maximum(x2 - x1 + 1, 1.0)
    rh = jnp.maximum(y2 - y1 + 1, 1.0)
    grid = _bin_centers(p, s) / p
    x = x1[:, None, None] + grid[None, None, :] * rw[:, None, None]
    y = y1[:, None, None] + grid[None, :, None] * rh[:, None, None]
    x = jnp.broadcast_to(x, (rois.shape[0], p * s, p * s))
    y = jnp.broadcast_to(y, (rois.shape[0], p * s, p * s))
    vals = _batched_bilinear(features, b_idx, y, x)
    vals = vals.reshape(vals.shape[0], p, s, p, s, -1)
    return vals.max(axis=(2, 4))


# ---------------------------------------------------------------------------
# Pyramid RoIAlign: one gather over a flattened FPN pyramid
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def _row_window_mean(x, k: int):
    """Non-overlapping k-row window mean over dim 0 of [N, C] via
    reduce_window (layout-preserving on TPU — never re-tiles; generic
    reduce_window lacks autodiff, so the adjoint — a plain broadcast
    for stride == window — is supplied manually)."""
    return jax.lax.reduce_window(
        x, jnp.zeros((), x.dtype), jax.lax.add,
        (k, 1), (k, 1), "VALID") / k


def _row_window_mean_fwd(x, k: int):
    return _row_window_mean(x, k), None


def _row_window_mean_bwd(k: int, _, g):
    return (jnp.repeat(g, k, axis=0) / k,)


_row_window_mean.defvjp(_row_window_mean_fwd, _row_window_mean_bwd)


def _pyramid_flatten(feats):
    """[ [N,H_l,W_l,C] ] -> ([N*S, C], level row offsets, (H_l, W_l))."""
    n = feats[0].shape[0]
    c = feats[0].shape[-1]
    flats = [f.reshape(n, -1, c) for f in feats]
    sizes = [f.shape[1] * f.shape[2] for f in feats]
    offsets = [0]
    for s in sizes[:-1]:
        offsets.append(offsets[-1] + s)
    flat = jnp.concatenate(flats, axis=1)            # [N, S, C]
    total = flat.shape[1]
    return flat.reshape(n * total, c), offsets, total


@functools.partial(
    jax.jit,
    static_argnames=("output_size", "sampling_ratio", "strides",
                     "finest_scale"))
def roi_align_rotated_pyramid(feats, rois, output_size: int,
                              strides=(4, 8, 16, 32),
                              sampling_ratio: int = 2,
                              finest_scale: float = 56.0):
    """Level-routed rotated RoIAlign with ONE gather.

    TPU-first replacement for the reference extractor's per-level
    boolean scatter (``roi_extractors/oriented_single_level.py:91-114``)
    and for the 4x-overcompute one-hot variant: all FPN levels are
    flattened into a single [N*S, C] buffer; each roi's sample
    coordinates are computed at its own (data-dependent) level and
    translated into flat row indices — XLA emits exactly one gather of
    the needed points.

    Args:
      feats: per-level [N, H_l, W_l, C] (len == len(strides)).
      rois: [R, 6] (batch_idx, cx, cy, w, h, theta), w/h already
        inflated by the caller's extend_factor.

    Returns [R, P, P, C].
    """
    assert sampling_ratio > 0
    p, s = output_size, sampling_ratio
    num_levels = len(strides)
    rois = rois.astype(jnp.float32)

    # HBM-locality sort: gathers achieve far higher bandwidth when
    # consecutive rois touch nearby rows, so process rois ordered by
    # their flat pyramid address (batch, level, y, x) and unsort the
    # pooled output at the end
    scale0 = jnp.sqrt(jnp.maximum(rois[:, 3] * rois[:, 4], 1e-6))
    lvl0 = jnp.clip(jnp.floor(jnp.log2(scale0 / finest_scale + 1e-6)),
                    0, num_levels - 1).astype(jnp.int32)
    stride0 = jnp.asarray(strides, jnp.float32)[lvl0]
    h0 = jnp.asarray([f.shape[1] for f in feats], jnp.float32)[lvl0]
    w0 = jnp.asarray([f.shape[2] for f in feats], jnp.float32)[lvl0]
    addr = (rois[:, 0] * num_levels + lvl0.astype(jnp.float32)) \
        * (h0 * w0) + (rois[:, 2] / stride0) * w0 + rois[:, 1] / stride0
    order = jnp.argsort(addr)
    inv = jnp.zeros_like(order).at[order].set(
        jnp.arange(order.shape[0]))
    rois = rois[order]

    b_idx = rois[:, 0].astype(jnp.int32)
    # per-roi level by sqrt-area (reference map_roi_levels)
    scale = jnp.sqrt(jnp.maximum(rois[:, 3] * rois[:, 4], 1e-6))
    lvl = jnp.clip(jnp.floor(jnp.log2(scale / finest_scale + 1e-6)),
                   0, num_levels - 1).astype(jnp.int32)

    stride_tab = jnp.asarray(strides, jnp.float32)
    h_tab = jnp.asarray([f.shape[1] for f in feats], jnp.int32)
    w_tab = jnp.asarray([f.shape[2] for f in feats], jnp.int32)
    flat, offsets, total = _pyramid_flatten(feats)
    off_tab = jnp.asarray(offsets, jnp.int32)

    inv_stride = 1.0 / stride_tab[lvl]                  # [R]
    cx = rois[:, 1] * inv_stride - 0.5
    cy = rois[:, 2] * inv_stride - 0.5
    rw = jnp.maximum(rois[:, 3] * inv_stride, 1.0)
    rh = jnp.maximum(rois[:, 4] * inv_stride, 1.0)
    theta = rois[:, 5]
    grid = _bin_centers(p, s)                           # [P*s]
    xx = (grid[None, :] / p - 0.5) * rw[:, None]
    yy = (grid[None, :] / p - 0.5) * rh[:, None]
    ct = jnp.cos(theta)[:, None, None]
    st = jnp.sin(theta)[:, None, None]
    xg = xx[:, None, :]
    yg = yy[:, :, None]
    x = xg * ct + yg * st + cx[:, None, None]           # [R, G, G]
    y = yg * ct - xg * st + cy[:, None, None]

    # Reorder samples BIN-MAJOR (bin_y, bin_x, dy, dx) right at the f32
    # coordinate stage, so ALL downstream index math, weights, gathers,
    # and the bin mean run on clean flat 2-D [R, S] / [R*S, C] layouts
    # (a [R, G, G, C] view of the gather output pads G to sublane
    # multiples — a full physical relayout of ~GB tensors, measured
    # 2x10 ms at batch 8; and permuting the int index tensors instead
    # materializes slow 5-D broadcasts).
    def binmajor(a):
        return a.reshape(a.shape[0], p, s, p, s) \
            .transpose(0, 1, 3, 2, 4).reshape(a.shape[0], -1)

    x = binmajor(x)                                     # [R, S]
    y = binmajor(y)

    h_r = h_tab[lvl][:, None]
    w_r = w_tab[lvl][:, None]
    oob = (y < -1.0) | (y > h_r.astype(y.dtype)) \
        | (x < -1.0) | (x > w_r.astype(x.dtype))
    y = jnp.maximum(y, 0.0)
    x = jnp.maximum(x, 0.0)
    y_low = y.astype(jnp.int32)
    x_low = x.astype(jnp.int32)
    yc = y_low >= h_r - 1
    xc = x_low >= w_r - 1
    y_low = jnp.where(yc, h_r - 1, y_low)
    x_low = jnp.where(xc, w_r - 1, x_low)
    y_high = jnp.where(yc, h_r - 1, y_low + 1)
    x_high = jnp.where(xc, w_r - 1, x_low + 1)
    y = jnp.where(yc, y_low.astype(y.dtype), y)
    x = jnp.where(xc, x_low.astype(x.dtype), x)
    ly = y - y_low.astype(y.dtype)                      # [R, S]
    lx = x - x_low.astype(x.dtype)
    hy = 1.0 - ly
    hx = 1.0 - lx

    base = (b_idx * total + off_tab[lvl])[:, None]      # [R, 1]

    # TPU gathers are issue-bound (~100M rows/s regardless of row size
    # or locality), so halve the row count: pack the pyramid into
    # fused rows of 2 adjacent cells (packed[r] = concat(flat[r],
    # flat[r+1])); both x-corners of a bilinear sample then come from
    # ONE gather row, so 2 gathers (y_low / y_high) replace 4 — at the
    # cost of 2x pyramid memory (hundreds of MB, cheap next to HBM).
    c = flat.shape[-1]
    packed = jnp.concatenate(
        [flat, jnp.roll(flat, -1, axis=0)], axis=1)    # [NR, 2C]

    r_n = rois.shape[0]
    S = (p * s) * (p * s)
    f_lo = (base + y_low * w_r + x_low).reshape(r_n * S)
    f_hi = (base + y_high * w_r + x_low).reshape(r_n * S)
    rows_t = packed[f_lo]                              # [R*S, 2C]
    rows_b = packed[f_hi]
    # x_high == x_low at the right border, where lx == 0 by the clamp
    # above — the (unused) x_low+1 cell then carries weight 0.
    # The combine stays in the feature dtype (f32 weights would upcast
    # everything, doubling traffic); oob zeroing folds into the
    # y-weights.
    live = 1.0 - oob.astype(jnp.float32)
    dt = flat.dtype

    def wcol(w):
        return w.reshape(r_n * S, 1).astype(dt)

    hy_ = wcol(hy * live)
    ly_ = wcol(ly * live)
    lx_ = wcol(lx)
    hx_ = wcol(hx)
    out = (hy_ * (hx_ * rows_t[:, :c] + lx_ * rows_t[:, c:])
           + ly_ * (hx_ * rows_b[:, :c] + lx_ * rows_b[:, c:]))
    pooled = _row_window_mean(out, s * s)              # [R*P*P, C]
    return pooled.reshape(r_n, p, p, c)[inv]


@functools.partial(jax.jit,
                   static_argnames=("output_size", "sampling_ratio"))
def psroi_align(features, rois, output_size: int, spatial_scale: float,
                sampling_ratio: int = 2):
    """Position-sensitive RoIAlign (reference ``psroi_align.py:265``).

    Input channels must be ``output_size**2 * C_out``; bin (i, j) pools
    from channel group ``i * P + j`` — realized as the standard aligned
    sampling followed by a static gather over the channel groups.
    """
    p, s = output_size, sampling_ratio
    r = rois.shape[0]
    pooled = roi_align(features, rois, p, spatial_scale, s)
    c_in = pooled.shape[-1]
    c_out = c_in // (p * p)
    pooled = pooled.reshape(r, p, p, p * p, c_out)
    bin_idx = (jnp.arange(p)[:, None] * p
               + jnp.arange(p)[None, :]).reshape(p, p)   # [P, P]
    take = jnp.broadcast_to(bin_idx[None, :, :, None, None],
                            (r, p, p, 1, c_out))
    return jnp.take_along_axis(pooled, take, axis=3)[:, :, :, 0]


class PSROIAlign:
    """Module wrapper (reference ``psroi_align.py:277``)."""

    def __init__(self, output_size, spatial_scale, sampling_ratio=2):
        self.output_size = (output_size if isinstance(output_size, int)
                            else output_size[0])
        self.spatial_scale = spatial_scale
        self.sampling_ratio = max(int(sampling_ratio), 1)

    def __call__(self, features, rois):
        return psroi_align(features, rois, self.output_size,
                           self.spatial_scale, self.sampling_ratio)
