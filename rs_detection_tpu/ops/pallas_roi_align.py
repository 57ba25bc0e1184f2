"""Pallas rotated RoIAlign over an FPN pyramid: window DMA + MXU matmul.

The XLA pyramid-gather path (``ops/roi_align.py``) is issue-bound: TPU
gathers sustain a fixed row-issue rate regardless of row bytes, and
16k rois x 196 samples x 2 packed rows ~= 6.3M gather rows -> ~46 ms on
the flagship (docs/perf_notes.md). This kernel replaces per-sample row
fetches with per-roi *block* transfers:

  1. rois are binned to FPN levels (reference ``map_roi_levels``
     semantics, ``python/jdet/models/roi_extractors/
     oriented_single_level.py:53-103``) and sorted so rois whose
     rotated sample extent fits a fixed window ("tier A") come first;
  2. per roi, ONE strided DMA copies a [WIN_H, WIN_W, C] feature
     window around the roi center from HBM — a block transfer at full
     bandwidth, not a gather — double-buffered across grid steps;
  3. the bilinear + bin-mean interpolation is precomputed OUTSIDE the
     kernel as a dense per-roi matrix ``A [P*P, WIN_H*WIN_W]`` (one
     fused XLA elementwise pass, bandwidth-cheap), and the kernel
     computes ``pooled = A @ window.reshape(WIN_H*WIN_W, C)`` on the
     MXU;
  4. rois whose extent exceeds the window (rare long-aspect cases) are
     overwritten by the exact XLA gather path, bounded by a static
     ``fallback_frac`` capacity; overflow beyond the capacity degrades
     gracefully to window-clamped sampling.

Numerics match ``ops/roi_align.py``'s border semantics exactly: for a
sample clamped into the feature map, the bilinear corner weight at
integer pixel p is ``relu(1 - |s - p|)``, which reproduces the
reference CUDA ``bilinear_interpolate`` low/high clamps
(``python/jdet/ops/roi_align_rotated_v1.py:24-68``); out-of-bounds
samples (y < -1 or y > H etc.) contribute zero.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .roi_align import _bin_centers, roi_align_rotated_pyramid

# Window geometry. The W dim of a DMA'd block must be 16-aligned for
# bf16 (8 for f32) — see ops/pallas_dwconv.py — so the window is wider
# than tall and its x-origin snaps down to X_ALIGN. A roi fits tier A
# when its per-axis sample half-extent is <= EXTENT/2 (x guarantee:
# x0 = align16(floor(cx) - 15) >= cx - 31, right edge x0 + WIN_W - 1
# >= cx + 16).
WIN_H = 32
WIN_W = 48
X_ALIGN = 16
_EXTENT = 30.0

# Small-roi tier: most DOTA objects span only a few feature pixels at
# their level, so their samples fit a [24, 32] sub-window DMA'd into
# the center region of the standard window (dst offsets 4/16 keep the
# VMEM slice tile-aligned). The surrounding ring holds stale-but-
# finite data with zero A-weight (scratch is zeroed at program 0), so
# numerics are unchanged — only DMA bytes drop (786 KB -> 393 KB).
SWIN_H = 24
SWIN_W = 32
S_OFF_Y = 4
S_OFF_X = 16
SX_ALIGN = 8
_S_EXT_X = 14.0
_S_EXT_Y = 22.0


import os

_DEBUG = os.environ.get("RS_PALLAS_ROI_DEBUG", "")   # "nodma"|"nomatmul"


def _pool_kernel(meta1_ref, meta2_ref, a_ref, *rest, num_levels: int,
                 rb: int):
    feat_refs = rest[:num_levels]
    out_ref = rest[num_levels]
    win = rest[num_levels + 1]
    sems = rest[num_levels + 2]

    i = pl.program_id(0)
    nprog = pl.num_programs(0)

    def issue(prog, slot):
        for k in range(rb):
            r = prog * rb + k
            m1 = meta1_ref[r]
            m2 = meta2_ref[r]
            b = m1 // (2 * num_levels)
            lvl = (m1 // 2) - b * num_levels
            small = m1 - (m1 // 2) * 2
            y0 = m2 // 8192
            x0 = m2 - y0 * 8192
            for level in range(num_levels):
                @pl.when((lvl == level) & (small == 0))
                def _(level=level):
                    # x origins are snapped to X_ALIGN on the host
                    # side; the hint lets Mosaic prove the HBM slice
                    # is tile-aligned in W
                    pltpu.make_async_copy(
                        feat_refs[level].at[
                            b, pl.ds(y0, WIN_H),
                            pl.ds(pl.multiple_of(x0, X_ALIGN), WIN_W),
                            :],
                        win.at[slot, k],
                        sems.at[slot, k]).start()

                @pl.when((lvl == level) & (small == 1))
                def _(level=level):
                    pltpu.make_async_copy(
                        feat_refs[level].at[
                            b, pl.ds(y0, SWIN_H),
                            pl.ds(pl.multiple_of(x0, SX_ALIGN), SWIN_W),
                            :],
                        win.at[slot, k, pl.ds(S_OFF_Y, SWIN_H),
                               pl.ds(S_OFF_X, SWIN_W), :],
                        sems.at[slot, k]).start()

    slot = jax.lax.rem(i, 2)
    nslot = jax.lax.rem(i + 1, 2)

    if _DEBUG != "nodma":
        @pl.when(i == 0)
        def _():
            # small-tier DMAs leave a ring of the window untouched;
            # it carries zero A-weight but must be finite
            win[...] = jnp.zeros(win.shape, win.dtype)
            issue(0, 0)

        @pl.when(i + 1 < nprog)
        def _():
            issue(i + 1, nslot)

    for k in range(rb):
        if _DEBUG != "nodma":
            m1 = meta1_ref[i * rb + k]
            small = m1 - (m1 // 2) * 2
            # wait via a descriptor with the same dst/semaphore shape
            # as the copy that was started (src ref is irrelevant to
            # the wait; only the byte count must match)
            @pl.when(small == 0)
            def _():
                pltpu.make_async_copy(
                    feat_refs[0].at[0, pl.ds(0, WIN_H),
                                    pl.ds(0, WIN_W), :],
                    win.at[slot, k],
                    sems.at[slot, k]).wait()

            @pl.when(small == 1)
            def _():
                pltpu.make_async_copy(
                    feat_refs[0].at[0, pl.ds(0, SWIN_H),
                                    pl.ds(0, SWIN_W), :],
                    win.at[slot, k, pl.ds(S_OFF_Y, SWIN_H),
                           pl.ds(S_OFF_X, SWIN_W), :],
                    sems.at[slot, k]).wait()
        a = a_ref[k]                                     # [PP, AREA]
        w = win[slot, k].reshape(WIN_H * WIN_W, -1)      # [AREA, C]
        if _DEBUG == "nomatmul":
            pooled = (w[:49] * a[:, :1].astype(w.dtype)).astype(
                jnp.float32)
        else:
            pooled = jnp.dot(a, w.astype(a.dtype),
                             preferred_element_type=jnp.float32)
        out_ref[k] = pooled.astype(out_ref.dtype)


def _pallas_pool(a, meta1, meta2, feats, rb: int, interpret: bool):
    """a: [R, PP, AREA]; meta*: [R] int32; feats: padded per-level
    [N, Hp, Wp, Cp]. Returns [R, PP, Cp] in feats dtype."""
    num_levels = len(feats)
    r, pp, area = a.shape
    cp = feats[0].shape[-1]
    dt = feats[0].dtype
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(r // rb,),
        in_specs=(
            [pl.BlockSpec((rb, pp, area), lambda i, *_: (i, 0, 0),
                          memory_space=pltpu.VMEM)]
            + [pl.BlockSpec(memory_space=pl.ANY)] * num_levels),
        out_specs=pl.BlockSpec((rb, pp, cp), lambda i, *_: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, rb, WIN_H, WIN_W, cp), dt),
            pltpu.SemaphoreType.DMA((2, rb)),
        ],
    )
    itemsize = jnp.dtype(dt).itemsize
    win_bytes = 2 * rb * WIN_H * WIN_W * cp * itemsize
    a_bytes = 2 * rb * pp * area * itemsize
    out_bytes = 2 * rb * pp * cp * 4
    return pl.pallas_call(
        functools.partial(_pool_kernel, num_levels=num_levels, rb=rb),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((r, pp, cp), dt),
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            vmem_limit_bytes=min(win_bytes + a_bytes + out_bytes
                                 + 4 * 1024 * 1024, 100 * 1024 * 1024)),
        interpret=interpret,
    )(meta1, meta2, a.astype(dt), *feats)


def _sample_coords(rois, lvl, strides, h_tab, w_tab, p: int, s: int):
    """Bin-major sample coordinates at each roi's own level.

    Returns (x, y, live): [R, P*P, s*s] feature-scale coords clamped
    into the (unpadded) level bounds, and the in-bounds mask — the same
    border semantics as ops/roi_align.py:_batched_bilinear.
    """
    stride_tab = jnp.asarray(strides, jnp.float32)
    inv_stride = 1.0 / stride_tab[lvl]
    cx = rois[:, 1] * inv_stride - 0.5
    cy = rois[:, 2] * inv_stride - 0.5
    rw = jnp.maximum(rois[:, 3] * inv_stride, 1.0)
    rh = jnp.maximum(rois[:, 4] * inv_stride, 1.0)
    theta = rois[:, 5]
    grid = _bin_centers(p, s)                            # [P*s]
    xx = (grid[None, :] / p - 0.5) * rw[:, None]         # [R, P*s]
    yy = (grid[None, :] / p - 0.5) * rh[:, None]
    ct = jnp.cos(theta)[:, None, None]
    st = jnp.sin(theta)[:, None, None]
    xg = xx[:, None, :]
    yg = yy[:, :, None]
    x = xg * ct + yg * st + cx[:, None, None]            # [R, G, G]
    y = yg * ct - xg * st + cy[:, None, None]

    rn = rois.shape[0]

    def binmajor(v):                       # [R, G, G] -> [R, PP, s*s]
        return v.reshape(rn, p, s, p, s).transpose(0, 1, 3, 2, 4) \
            .reshape(rn, p * p, s * s)

    x = binmajor(x)
    y = binmajor(y)
    h_r = h_tab[lvl].astype(x.dtype)[:, None, None]
    w_r = w_tab[lvl].astype(x.dtype)[:, None, None]
    live = ~((y < -1.0) | (y > h_r) | (x < -1.0) | (x > w_r))
    x = jnp.clip(x, 0.0, w_r - 1.0)
    y = jnp.clip(y, 0.0, h_r - 1.0)
    return x, y, live, (cx, cy, rw, rh, ct[:, 0, 0], st[:, 0, 0])


def _pad_level(f):
    n, h, w, c = f.shape
    hp = max(WIN_H, h)
    wp = max(WIN_W, w)
    wp = wp + (-wp) % X_ALIGN
    cpad = (-c) % 128
    if (hp, wp, c + cpad) == (h, w, c):
        return f
    return jnp.pad(f, ((0, 0), (0, hp - h), (0, wp - w), (0, cpad)))


def _prepare(feats, rois_f, strides, finest_scale, p: int, s: int):
    """Sort rois (tier A first), compute window meta + the dense
    interpolation matrix A. Returns (a, meta1, meta2, padded feats,
    sorted rois, inverse permutation)."""
    num_levels = len(strides)
    r = rois_f.shape[0]

    h_tab = jnp.asarray([f.shape[1] for f in feats], jnp.int32)
    w_tab = jnp.asarray([f.shape[2] for f in feats], jnp.int32)
    fp = [_pad_level(f) for f in feats]
    hp_tab = jnp.asarray([f.shape[1] for f in fp], jnp.int32)
    wp_tab = jnp.asarray([f.shape[2] for f in fp], jnp.int32)

    scale = jnp.sqrt(jnp.maximum(rois_f[:, 3] * rois_f[:, 4], 1e-6))
    lvl = jnp.clip(
        jnp.floor(jnp.log2(scale / finest_scale + 1e-6)),
        0, num_levels - 1).astype(jnp.int32)

    # tier: per-axis half-extent of the rotated sample lattice at the
    # roi's level must fit the guaranteed window coverage
    inv_stride = 1.0 / jnp.asarray(strides, jnp.float32)[lvl]
    rw = jnp.maximum(rois_f[:, 3] * inv_stride, 1.0)
    rh = jnp.maximum(rois_f[:, 4] * inv_stride, 1.0)
    act = jnp.abs(jnp.cos(rois_f[:, 5]))
    ast = jnp.abs(jnp.sin(rois_f[:, 5]))
    ext_x = rw * act + rh * ast
    ext_y = rw * ast + rh * act
    tier_b = (ext_x > _EXTENT) | (ext_y > _EXTENT)

    # sort: tier A first; within a tier, by (batch, level, y, x) for
    # window DMA locality
    cxi = jnp.clip((rois_f[:, 1] * inv_stride).astype(jnp.int32), 0, 8191)
    cyi = jnp.clip((rois_f[:, 2] * inv_stride).astype(jnp.int32), 0, 8191)
    b_i = jnp.clip(rois_f[:, 0].astype(jnp.int32), 0, 255)
    key = (tier_b.astype(jnp.int32) << 27) \
        + ((b_i * num_levels + lvl) << 18) + ((cyi >> 3) << 9) + (cxi >> 3)
    order = jnp.argsort(key)
    inv_order = jnp.zeros_like(order).at[order].set(
        jnp.arange(order.shape[0]))
    ros = rois_f[order]
    lvl = lvl[order]
    small = ((ext_x <= _S_EXT_X) & (ext_y <= _S_EXT_Y))[order] \
        .astype(jnp.int32)

    x, y, live, (cx, cy, _, _, _, _) = _sample_coords(
        ros, lvl, strides, h_tab, w_tab, p, s)

    cyi = jnp.floor(cy).astype(jnp.int32)
    cxi = jnp.floor(cx).astype(jnp.int32)
    y0_full = jnp.clip(cyi - (WIN_H // 2 - 1), 0, hp_tab[lvl] - WIN_H)
    x0_full = jnp.clip((cxi - (WIN_H // 2 - 1)) // X_ALIGN * X_ALIGN,
                       0, wp_tab[lvl] - WIN_W)
    y0_sdma = jnp.clip(cyi - (SWIN_H // 2 - 1), 0, hp_tab[lvl] - SWIN_H)
    x0_sdma = jnp.clip((cxi - (SWIN_W // 2 - 1)) // SX_ALIGN * SX_ALIGN,
                       0, wp_tab[lvl] - SWIN_W)
    is_s = small == 1
    y0_dma = jnp.where(is_s, y0_sdma, y0_full)
    x0_dma = jnp.where(is_s, x0_sdma, x0_full)
    # A is built against the LOGICAL window base: for small rois the
    # DMA lands at (S_OFF_Y, S_OFF_X) inside the window buffer
    y0 = jnp.where(is_s, y0_sdma - S_OFF_Y, y0_full)
    x0 = jnp.where(is_s, x0_sdma - S_OFF_X, x0_full)

    sx = jnp.clip(x - x0[:, None, None].astype(x.dtype), 0.0, WIN_W - 1.0)
    sy = jnp.clip(y - y0[:, None, None].astype(y.dtype), 0.0, WIN_H - 1.0)
    # dead samples get weight 0 everywhere via an off-grid coordinate
    sx = jnp.where(live, sx, -10.0)

    # dense interpolation matrix: A[r, bin, py*WIN_W+px] =
    #   (1/s^2) sum_j relu(1-|sy_j-py|) * relu(1-|sx_j-px|).
    # Written as an explicit j-sum of broadcast products so XLA fuses
    # it into one elementwise pass over the output (an einsum here
    # lowers to R*P*P tiny K=s^2 batched matmuls — measured far
    # slower).
    py = jnp.arange(WIN_H, dtype=jnp.float32)
    px = jnp.arange(WIN_W, dtype=jnp.float32)
    dt = feats[0].dtype
    a = None
    for j in range(s * s):
        wy = jax.nn.relu(1.0 - jnp.abs(sy[:, :, j, None] - py))
        wx = jax.nn.relu(1.0 - jnp.abs(sx[:, :, j, None] - px))
        term = wy[:, :, :, None] * wx[:, :, None, :]   # [R,PP,WH,WW]
        a = term if a is None else a + term
    a = (a * (1.0 / (s * s))).astype(dt)
    a = a.reshape(r, p * p, WIN_H * WIN_W)

    b_idx = jnp.clip(ros[:, 0].astype(jnp.int32), 0, fp[0].shape[0] - 1)
    meta1 = (b_idx * num_levels + lvl) * 2 + small
    meta2 = y0_dma * 8192 + x0_dma
    return a, meta1, meta2, fp, ros, inv_order


@functools.partial(
    jax.jit, static_argnames=("output_size", "strides", "sampling_ratio",
                              "finest_scale", "fallback_frac",
                              "rois_per_program", "interpret"))
def _pyramid_pallas_impl(feats, rois, output_size: int, strides,
                         sampling_ratio: int, finest_scale: float,
                         fallback_frac: float, rois_per_program: int,
                         interpret: bool):
    p, s = output_size, sampling_ratio
    num_levels = len(strides)
    feats = list(feats)[:num_levels]
    c = feats[0].shape[-1]
    rb = rois_per_program
    r0 = rois.shape[0]
    r = r0 + (-r0) % rb
    rois_f = rois.astype(jnp.float32)
    if r != r0:
        rois_f = jnp.pad(rois_f, ((0, r - r0), (0, 0)))

    a, meta1, meta2, fp, ros, inv_order = _prepare(
        feats, rois_f, strides, finest_scale, p, s)

    pooled = _pallas_pool(a, meta1, meta2, fp, rb, interpret)  # [R,PP,Cp]
    pooled = pooled[..., :c]

    n_fb = 0 if fallback_frac <= 0 else \
        min(r, max(rb, int(round(r * fallback_frac))))
    if n_fb:
        tail = ros[r - n_fb:]
        fb = roi_align_rotated_pyramid(
            feats, tail, p, strides=tuple(strides), sampling_ratio=s,
            finest_scale=float(finest_scale))
        pooled = pooled.at[r - n_fb:].set(
            fb.reshape(n_fb, p * p, c).astype(pooled.dtype))

    out = pooled[inv_order][:r0]
    return out.reshape(r0, p, p, c)


@functools.partial(
    jax.custom_vjp,
    nondiff_argnums=(2, 3, 4, 5, 6, 7, 8))
def roi_align_rotated_pyramid_pallas(feats, rois, output_size: int = 7,
                                     strides=(4, 8, 16, 32),
                                     sampling_ratio: int = 2,
                                     finest_scale: float = 56.0,
                                     fallback_frac: float = 0.25,
                                     rois_per_program: int = 4,
                                     interpret: bool = False):
    """Drop-in replacement for ``roi_align_rotated_pyramid`` (same
    args/semantics) with a Pallas window+MXU forward; the backward pass
    reuses the XLA gather path's autodiff."""
    return _pyramid_pallas_impl(
        list(feats), rois, output_size, tuple(strides), sampling_ratio,
        finest_scale, fallback_frac, rois_per_program, interpret)


def _pallas_fwd(feats, rois, output_size, strides, sampling_ratio,
                finest_scale, fallback_frac, rois_per_program, interpret):
    out = _pyramid_pallas_impl(
        list(feats), rois, output_size, tuple(strides), sampling_ratio,
        finest_scale, fallback_frac, rois_per_program, interpret)
    return out, (list(feats), rois)


def _pallas_bwd(output_size, strides, sampling_ratio, finest_scale,
                fallback_frac, rois_per_program, interpret, res, g):
    feats, rois = res
    _, vjp = jax.vjp(
        lambda f, rr: roi_align_rotated_pyramid(
            f, rr, output_size, strides=tuple(strides),
            sampling_ratio=sampling_ratio,
            finest_scale=float(finest_scale)),
        feats, rois)
    d_feats, d_rois = vjp(g.astype(feats[0].dtype))
    return d_feats, d_rois


roi_align_rotated_pyramid_pallas.defvjp(_pallas_fwd, _pallas_bwd)
