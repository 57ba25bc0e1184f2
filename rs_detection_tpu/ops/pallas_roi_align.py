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
import numpy as _np
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
# Big-window tier (per-axis extent <= 38): one [40, 64, C] DMA per
# roi (rb=1, ~1.3 MB) replaces the XLA gather fallback. Sized from
# the measured bench proposal stream (round-5 fb_need probe): tier>=1
# rois are NOT long-aspect — they are near-square top-of-level-bucket
# boxes whose max-axis extent is p50=32 / p95=37.7 / p99=46.1, so an
# extent-38 window captures 95.4% of them at 42% of the [64, 96]
# window's DMA bytes; the rest (~0.8% of all rois) stays on the exact
# XLA tail, which the dynamic bucket then serves at its smallest
# capacity. Coverage guarantee (same arithmetic as the std window):
# y rows floor(cy)-19..floor(cy)+20 cover samples within cy+-19;
# x0 = align16(floor(cx)-19) >= cx-35, right edge x0+63 >= cx+28.
BWIN_H = 40
BWIN_W = 64
_B_EXT = 38.0

SWIN_H = 24
SWIN_W = 32
S_OFF_Y = 4
S_OFF_X = 16
SX_ALIGN = 8
_S_EXT_X = 14.0
_S_EXT_Y = 22.0

# Micro tier: the bulk of DOTA objects span only ~8-11 feature pixels
# at their assigned level (per-axis sample extent <= 13), so a
# [16, 32] DMA (H has no Mosaic alignment constraint, W shared with
# the small tier) cuts their window traffic another 33% vs the small
# tier. The kernel is DMA-bound (docs/perf_notes.md probes), so this
# lands directly on the critical path.
MWIN_H = 16
M_OFF_Y = 8
_M_EXT_Y = 13.0


import os

_DEBUG = os.environ.get("RS_PALLAS_ROI_DEBUG", "")   # "nodma"|"nomatmul"
# window buffer slots (prefetch depth = slots - 1); 2 = classic double
# buffering
_NSLOTS = max(2, int(os.environ.get("RS_ROI_SLOTS", "2")))
# Store the interpolation matrix A as uint8 fixed-point (x255). A's
# entries are bilinear weights in [0, 1] and zeros quantize exactly, so
# the only error is <=0.5/255 on the <=16 nonzero cols of each row —
# below bf16 feature noise. The win is bandwidth: A is the largest
# tensor in the extractor ([R, 49, 1536]), and XLA materializes it
# R-minor then relayout-copies it row-major for the kernel (R=16000 is
# a pad-free lane dim, so every layout the build fusion likes is
# R-minor); uint8 halves the build write, the 4.8 GB relayout copy and
# the kernel's A reads vs bf16. The 1/255 scale is applied to the
# pooled output after the matmul (linearity), not per-element.
_A_U8 = os.environ.get("RS_ROI_A_U8", "1") != "0"


def _pool_kernel(meta1_ref, meta2_ref, a_ref, *rest, num_levels: int,
                 rb: int, win_h: int, win_w: int, x_align: int,
                 sub=None, inkernel_ss: int = 0):
    # sub = (swin_h, swin_w, off_y, off_x, sx_align) enables the
    # small-roi half-size DMA path; None disables it
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
            b = m1 // (4 * num_levels)
            lvl = (m1 // 4) - b * num_levels
            tier = m1 - (m1 // 4) * 4
            y0 = m2 // 8192
            x0 = m2 - y0 * 8192
            for level in range(num_levels):
                @pl.when((lvl == level) & (tier == 0))
                def _(level=level):
                    # x origins are snapped to x_align on the host
                    # side; the hint lets Mosaic prove the HBM slice
                    # is tile-aligned in W
                    pltpu.make_async_copy(
                        feat_refs[level].at[
                            b, pl.ds(y0, win_h),
                            pl.ds(pl.multiple_of(x0, x_align), win_w),
                            :],
                        win.at[slot, k],
                        sems.at[slot, k]).start()

                if sub is not None:
                    for t_id, (twin_h, twin_w, off_y, off_x,
                               tx_align) in enumerate(sub, start=1):
                        @pl.when((lvl == level) & (tier == t_id))
                        def _(level=level, twin_h=twin_h,
                              twin_w=twin_w, off_y=off_y, off_x=off_x,
                              tx_align=tx_align):
                            pltpu.make_async_copy(
                                feat_refs[level].at[
                                    b, pl.ds(y0, twin_h),
                                    pl.ds(pl.multiple_of(x0, tx_align),
                                          twin_w), :],
                                win.at[slot, k, pl.ds(off_y, twin_h),
                                       pl.ds(off_x, twin_w), :],
                                sems.at[slot, k]).start()

    warm = _NSLOTS - 1
    slot = jax.lax.rem(i, _NSLOTS)

    if _DEBUG != "nodma":
        @pl.when(i == 0)
        def _():
            # small-tier DMAs leave a ring of the window untouched;
            # it carries zero A-weight but must be finite
            win[...] = jnp.zeros(win.shape, win.dtype)
            for p in range(warm):
                @pl.when(p < nprog)
                def _(p=p):
                    issue(p, p % _NSLOTS)

        @pl.when(i + warm < nprog)
        def _():
            issue(i + warm, jax.lax.rem(i + warm, _NSLOTS))

    for k in range(rb):
        if _DEBUG != "nodma":
            m1 = meta1_ref[i * rb + k]
            tier = m1 - (m1 // 4) * 4
            # wait via a descriptor with the same dst/semaphore shape
            # as the copy that was started (src ref is irrelevant to
            # the wait; only the byte count must match)
            @pl.when(tier == 0)
            def _():
                pltpu.make_async_copy(
                    feat_refs[0].at[0, pl.ds(0, win_h),
                                    pl.ds(0, win_w), :],
                    win.at[slot, k],
                    sems.at[slot, k]).wait()

            if sub is not None:
                for t_id, (twin_h, twin_w, off_y, off_x,
                           _txa) in enumerate(sub, start=1):
                    @pl.when(tier == t_id)
                    def _(twin_h=twin_h, twin_w=twin_w, off_y=off_y,
                          off_x=off_x):
                        pltpu.make_async_copy(
                            feat_refs[0].at[0, pl.ds(0, twin_h),
                                            pl.ds(0, twin_w), :],
                            win.at[slot, k, pl.ds(off_y, twin_h),
                                   pl.ds(off_x, twin_w), :],
                            sems.at[slot, k]).wait()
        w = win[slot, k].reshape(win_h * win_w, -1)      # [AREA, C]
        u8 = False
        if inkernel_ss:
            # in-kernel A build (RS_ROI_A_INKERNEL=1): a_ref carries
            # the window-relative sample coords [rb, 2, PP, SS] and A
            # is built HERE, directly in the [PP, AREA] layout the MXU
            # dot wants — no HBM A tensor, no build fusion, no R-minor
            # relayout copy (5.7 + 3.4 ms standalone + the kernel's A
            # input DMA at 16k rois, roofline §1). The build is VPU
            # work that overlaps the window DMA waits.
            sx = a_ref[k, 0]                             # [PP, SS] f32
            sy = a_ref[k, 1]
            area = win_h * win_w
            q = jax.lax.broadcasted_iota(jnp.int32, (1, area), 1)
            yq = (q // win_w).astype(jnp.float32)        # [1, AREA]
            xq = (q - (q // win_w) * win_w).astype(jnp.float32)
            acc = jnp.zeros((sx.shape[0], area), jnp.float32)
            for j in range(inkernel_ss):
                wy = jnp.maximum(
                    0.0, 1.0 - jnp.abs(sy[:, j, None] - yq))
                wx = jnp.maximum(
                    0.0, 1.0 - jnp.abs(sx[:, j, None] - xq))
                acc = acc + wy * wx
            a = (acc * (1.0 / inkernel_ss)).astype(w.dtype)
        else:
            a = a_ref[k]                                 # [PP, AREA]
            u8 = a.dtype == jnp.uint8
            if u8:
                # Mosaic has no direct u8->bf16 cast; chain via i32/f32
                a = a.astype(jnp.int32).astype(jnp.float32) \
                    .astype(w.dtype)
        if _DEBUG == "nomatmul":
            pooled = (w[:49] * a[:, :1].astype(w.dtype)).astype(
                jnp.float32)
        else:
            pooled = jnp.dot(a, w.astype(a.dtype),
                             preferred_element_type=jnp.float32)
        if u8:
            pooled = pooled * (1.0 / 255.0)
        out_ref[k] = pooled.astype(out_ref.dtype)


def _pallas_pool(a, meta1, meta2, feats, rb: int, interpret: bool,
                 win_h: int = WIN_H, win_w: int = WIN_W,
                 x_align: int = X_ALIGN, sub="std",
                 inkernel_ss: int = 0):
    """a: [R, PP, AREA] (dense A) or, with ``inkernel_ss`` = s*s, the
    window-relative sample coords [R, 2, PP, s*s] from which the
    kernel builds A itself; meta*: [R] int32; feats: padded per-level
    [N, Hp, Wp, Cp]. Returns [R, PP, Cp] in feats dtype."""
    if sub == "std":
        sub = ((SWIN_H, SWIN_W, S_OFF_Y, S_OFF_X, SX_ALIGN),
               (MWIN_H, SWIN_W, M_OFF_Y, S_OFF_X, SX_ALIGN))
    num_levels = len(feats)
    r, pp = a.shape[0], a.shape[-2]
    area = win_h * win_w
    cp = feats[0].shape[-1]
    dt = feats[0].dtype
    a_block = ((rb, 2, pp, a.shape[-1]) if inkernel_ss
               else (rb, pp, area))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(r // rb,),
        in_specs=(
            [pl.BlockSpec(a_block, lambda i, *_: (i,) + (0,)
                          * (len(a_block) - 1),
                          memory_space=pltpu.VMEM)]
            + [pl.BlockSpec(memory_space=pl.ANY)] * num_levels),
        out_specs=pl.BlockSpec((rb, pp, cp), lambda i, *_: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((_NSLOTS, rb, win_h, win_w, cp), dt),
            pltpu.SemaphoreType.DMA((_NSLOTS, rb)),
        ],
    )
    if not inkernel_ss and a.dtype != jnp.uint8:
        a = a.astype(dt)
    itemsize = jnp.dtype(dt).itemsize
    win_bytes = _NSLOTS * rb * win_h * win_w * cp * itemsize
    a_bytes = 2 * rb * pp * area * jnp.dtype(a.dtype).itemsize
    # in-kernel A build: acc/wy/wx [PP, AREA] f32 temporaries
    build_bytes = (4 * pp * area * 4) if inkernel_ss else 0
    out_bytes = 2 * rb * pp * cp * 4
    return pl.pallas_call(
        functools.partial(_pool_kernel, num_levels=num_levels, rb=rb,
                          win_h=win_h, win_w=win_w, x_align=x_align,
                          sub=sub, inkernel_ss=inkernel_ss),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((r, pp, cp), dt),
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            vmem_limit_bytes=min(win_bytes + a_bytes + build_bytes
                                 + out_bytes
                                 + 4 * 1024 * 1024, 100 * 1024 * 1024)),
        interpret=interpret,
    )(meta1, meta2, a, *feats)


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

    # bin-major sample order via STATIC index gathers (not a
    # [R, G, G] -> transpose -> reshape chain): a transpose here makes
    # XLA carry an R-minor layout through the downstream A-matrix
    # build, which then costs a [R, PP, AREA] relayout copy (measured
    # 8.3 ms at 16k rois) right before the kernel's row-major input.
    import numpy as _np

    b_iy, b_ix = _np.divmod(_np.arange(p * p), p)        # bin (y, x)
    j_iy, j_ix = _np.divmod(_np.arange(s * s), s)        # sub-sample
    ix = (b_ix[:, None] * s + j_ix[None, :])             # [PP, s*s]
    iy = (b_iy[:, None] * s + j_iy[None, :])
    gx = xx[:, ix]                                       # [R, PP, s*s]
    gy = yy[:, iy]
    x = gx * ct + gy * st + cx[:, None, None]
    y = gy * ct - gx * st + cy[:, None, None]
    h_r = h_tab[lvl].astype(x.dtype)[:, None, None]
    w_r = w_tab[lvl].astype(x.dtype)[:, None, None]
    live = ~((y < -1.0) | (y > h_r) | (x < -1.0) | (x > w_r))
    x = jnp.clip(x, 0.0, w_r - 1.0)
    y = jnp.clip(y, 0.0, h_r - 1.0)
    return x, y, live, (cx, cy, rw, rh, ct[:, 0, 0], st[:, 0, 0])


def _pad_level(f, min_h: int = WIN_H, min_w: int = WIN_W):
    n, h, w, c = f.shape
    hp = max(min_h, h)
    wp = max(min_w, w)
    wp = wp + (-wp) % X_ALIGN
    cpad = (-c) % 128
    if (hp, wp, c + cpad) == (h, w, c):
        return f
    return jnp.pad(f, ((0, 0), (0, hp - h), (0, wp - w), (0, cpad)))


def _a_inkernel() -> bool:
    """RS_ROI_A_INKERNEL=1: the std pool kernel builds A itself from
    the sample coords (no HBM A tensor, no relayout copy). The
    backward's A^T (and any host-side A) must then be built with the
    same f32-sum -> *(1/s^2) -> cast order and WITHOUT the u8
    quantization, so the adjoint matches the forward bit-for-bit."""
    return os.environ.get("RS_ROI_A_INKERNEL", "0") == "1"


def _build_a(sx, sy, win_h: int, win_w: int, s: int, dt):
    """Dense interpolation matrix A[r, bin, py*win_w+px] =
    (1/s^2) sum_j relu(1-|sy_j-py|) * relu(1-|sx_j-px|), from
    window-relative bin-major sample coords [R, PP, s*s]. Written as
    an explicit j-sum of broadcast products so XLA fuses it into one
    elementwise pass over the output (an einsum here lowers to R*P*P
    tiny K=s^2 batched matmuls — measured far slower).

    The build is VPU-op-bound, not bandwidth-bound (13.7 ms at 16k
    rois ≈ 10 ops x 1.2G elements at ~1 vector op/cycle — see
    docs/roofline.md §1), so every full-area pass counts. The default
    path (``RS_ROI_A_FOLD=0`` restores the legacy one) folds the
    1/s^2 bin-mean and the x255 u8 fixed-point scale into the small
    [R, PP, win_h] y-factor, and rounds via ``+0.5`` + the truncating
    f32->u8 convert (a >= 0, so that is exact round-half-up; entries
    differ from the legacy round-half-even only at exact .5
    fixed-point ties, inside the documented <=0.5/255 quantization
    band) — two fewer full-area VPU passes."""
    py = jnp.arange(win_h, dtype=jnp.float32)
    px = jnp.arange(win_w, dtype=jnp.float32)
    u8 = _A_U8 and jnp.dtype(dt) == jnp.bfloat16
    fold = os.environ.get("RS_ROI_A_FOLD", "1") != "0"
    if _a_inkernel():
        # match the in-kernel build exactly (f32 sum, * 1/s^2, cast):
        # the backward's A^T must be the forward's A
        u8, fold = False, False
    scale = (255.0 if u8 else 1.0) / float(s * s) if fold else 1.0
    a = None
    for j in range(s * s):
        wy = jax.nn.relu(1.0 - jnp.abs(sy[:, :, j, None] - py))
        if fold:
            wy = wy * scale
        wx = jax.nn.relu(1.0 - jnp.abs(sx[:, :, j, None] - px))
        term = wy[:, :, :, None] * wx[:, :, None, :]
        a = term if a is None else a + term
    r, pp = sx.shape[0], sx.shape[1]
    if not fold:
        a = a * (1.0 / (s * s))
    # u8 only on the bf16 (inference) path: f32 callers get exact
    # bilinear weights
    if u8:
        if fold:
            a = (a + 0.5).astype(jnp.uint8)
        else:
            a = jnp.round(a * 255.0).astype(jnp.uint8)
    else:
        a = a.astype(dt)
    return a.reshape(r, pp, win_h * win_w)


def _fwd_order(rois_f, strides, finest_scale, num_levels):
    """Level assignment, window-tier classification and the forward
    sort order — shared by the forward and the backward so the
    backward can identify the exact fallback-tail roi set."""
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
    tier = jnp.where((ext_x > _EXTENT) | (ext_y > _EXTENT), 1, 0)
    tier = jnp.where((ext_x > _B_EXT) | (ext_y > _B_EXT), 2, tier)

    # sort: tier A first; within a tier, by (batch, level, y, x) for
    # window DMA locality
    cxi = jnp.clip((rois_f[:, 1] * inv_stride).astype(jnp.int32), 0, 8191)
    cyi = jnp.clip((rois_f[:, 2] * inv_stride).astype(jnp.int32), 0, 8191)
    b_i = jnp.clip(rois_f[:, 0].astype(jnp.int32), 0, 255)
    key = (tier << 27) \
        + ((b_i * num_levels + lvl) << 18) + ((cyi >> 3) << 9) + (cxi >> 3)
    order = jnp.argsort(key)
    return order, lvl, tier, ext_x, ext_y, inv_stride


def _prepare(feats, rois_f, strides, finest_scale, p: int, s: int,
             pad_min=(WIN_H, WIN_W), r_std=None):
    """Sort rois (std-window tier first, then big-window, then
    fallback), compute window meta + the dense interpolation matrix A.
    Returns (a, meta1, meta2, padded feats, sorted rois, sorted
    levels, inverse permutation). With ``r_std`` (the static-split
    prefix length), A/meta are built only for the prefix the std pass
    actually consumes — the A build is VPU-op-bound and A's relayout
    copy is the largest in the program (roofline §1), so the suffix
    rows routed to the big-window pass must not pay it."""
    num_levels = len(strides)
    r = rois_f.shape[0]

    h_tab = jnp.asarray([f.shape[1] for f in feats], jnp.int32)
    w_tab = jnp.asarray([f.shape[2] for f in feats], jnp.int32)
    fp = [_pad_level(f, min_h=pad_min[0], min_w=pad_min[1])
          for f in feats]
    hp_tab = jnp.asarray([f.shape[1] for f in fp], jnp.int32)
    wp_tab = jnp.asarray([f.shape[2] for f in fp], jnp.int32)

    order, lvl, tier, ext_x, ext_y, inv_stride = _fwd_order(
        rois_f, strides, finest_scale, num_levels)
    inv_order = jnp.zeros_like(order).at[order].set(
        jnp.arange(order.shape[0]))
    ros = rois_f[order]
    lvl = lvl[order]
    small = (ext_x <= _S_EXT_X) & (ext_y <= _S_EXT_Y)
    micro = small & (ext_y <= _M_EXT_Y)
    tier_dma = jnp.where(micro, 2, jnp.where(small, 1, 0))[order] \
        .astype(jnp.int32)

    rp = r if r_std is None else max(0, min(r, r_std))
    ros_p, lvl_p, tier_dma = ros[:rp], lvl[:rp], tier_dma[:rp]

    x, y, live, (cx, cy, _, _, _, _) = _sample_coords(
        ros_p, lvl_p, strides, h_tab, w_tab, p, s)

    cyi = jnp.floor(cy).astype(jnp.int32)
    cxi = jnp.floor(cx).astype(jnp.int32)
    y0_full = jnp.clip(cyi - (WIN_H // 2 - 1), 0, hp_tab[lvl_p] - WIN_H)
    x0_full = jnp.clip((cxi - (WIN_H // 2 - 1)) // X_ALIGN * X_ALIGN,
                       0, wp_tab[lvl_p] - WIN_W)
    y0_sdma = jnp.clip(cyi - (SWIN_H // 2 - 1),
                       0, hp_tab[lvl_p] - SWIN_H)
    y0_mdma = jnp.clip(cyi - (MWIN_H // 2 - 1),
                       0, hp_tab[lvl_p] - MWIN_H)
    x0_sdma = jnp.clip((cxi - (SWIN_W // 2 - 1)) // SX_ALIGN * SX_ALIGN,
                       0, wp_tab[lvl_p] - SWIN_W)
    is_s = tier_dma == 1
    is_m = tier_dma == 2
    y0_dma = jnp.where(is_m, y0_mdma, jnp.where(is_s, y0_sdma, y0_full))
    x0_dma = jnp.where(is_s | is_m, x0_sdma, x0_full)
    # A is built against the LOGICAL window base: for small/micro rois
    # the DMA lands at (S_OFF_Y/M_OFF_Y, S_OFF_X) inside the buffer
    y0 = jnp.where(is_m, y0_mdma - M_OFF_Y,
                   jnp.where(is_s, y0_sdma - S_OFF_Y, y0_full))
    x0 = jnp.where(is_s | is_m, x0_sdma - S_OFF_X, x0_full)

    sx = jnp.clip(x - x0[:, None, None].astype(x.dtype), 0.0, WIN_W - 1.0)
    sy = jnp.clip(y - y0[:, None, None].astype(y.dtype), 0.0, WIN_H - 1.0)
    # dead samples get weight 0 everywhere via an off-grid coordinate
    sx = jnp.where(live, sx, -10.0)

    if _a_inkernel():
        a = jnp.stack([sx, sy], axis=1)        # [rp, 2, PP, s*s] f32
    else:
        a = _build_a(sx, sy, WIN_H, WIN_W, s, feats[0].dtype)

    b_idx = jnp.clip(ros_p[:, 0].astype(jnp.int32), 0,
                     fp[0].shape[0] - 1)
    meta1 = (b_idx * num_levels + lvl_p) * 4 + tier_dma
    meta2 = y0_dma * 8192 + x0_dma
    # (tier>=1 count, tier>=2 count): the XLA exact tail sizes itself
    # by the first when it is the only oversize path, by the second
    # when the big-window pass (exact for tier 1) is enabled
    n_need = (jnp.sum((tier >= 1).astype(jnp.int32)),
              jnp.sum((tier >= 2).astype(jnp.int32)))
    return a, meta1, meta2, fp, ros, lvl, inv_order, n_need


def _fb_caps(r: int, rb: int, fallback_frac: float):
    """Static fallback-capacity buckets, ascending, 0 first.

    The exact-gather tail is pay-per-use: at run time the smallest
    bucket >= the actual tier>=1 roi count executes (lax.switch), so
    batches with few (or no) long-aspect rois skip most (or all) of
    the XLA gather work instead of always paying the static capacity
    (the round-4 finding: halving the static capacity alone measured
    +3.9% e2e). ``RS_ROI_FB_DYNAMIC=0`` restores the single static
    bucket. Forward and backward share this function so the vjp's
    XLA-subset matches the forward's overwrite exactly."""
    n_fb = 0 if fallback_frac <= 0 else \
        min(r, max(rb, int(round(r * fallback_frac))))
    if n_fb == 0:
        return [0]
    if os.environ.get("RS_ROI_FB_DYNAMIC", "1") == "0":
        return [0, n_fb]
    caps = sorted({min(n_fb, max(rb, n_fb // 8)),
                   min(n_fb, max(rb, n_fb // 4)),
                   min(n_fb, max(rb, n_fb // 2)), n_fb})
    return [0] + caps


def _fb_select(caps, n_need):
    """Index of the smallest capacity >= n_need (saturating)."""
    sel = jnp.searchsorted(jnp.asarray(caps, jnp.int32),
                           n_need.astype(jnp.int32), side="left")
    return jnp.minimum(sel, len(caps) - 1)


@functools.partial(
    jax.jit, static_argnames=("output_size", "strides", "sampling_ratio",
                              "finest_scale", "fallback_frac",
                              "rois_per_program", "interpret",
                              "big_frac"))
def _pyramid_pallas_impl(feats, rois, output_size: int, strides,
                         sampling_ratio: int, finest_scale: float,
                         fallback_frac: float, rois_per_program: int,
                         interpret: bool, big_frac: float = 0.0):
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

    n_big = 0 if big_frac <= 0 else min(r, int(round(r * big_frac)))
    pad_min = (BWIN_H, BWIN_W) if n_big else (WIN_H, WIN_W)
    # static split: the sorted suffix of length n_big is served by the
    # big-window pass, so the std pass — and the A build + relayout
    # feeding it — only covers the prefix (rounded up to a whole
    # program; the <=rb-1 overlap rows are recomputed by the big pass
    # and discarded). RS_ROI_BIG_SPLIT=0 restores compute-all +
    # overwrite for A/B.
    split = n_big and os.environ.get("RS_ROI_BIG_SPLIT", "1") != "0"
    r_std = r if not split else min(r, (r - n_big) + (-(r - n_big)) % rb)
    a, meta1, meta2, fp, ros, lvl_s, inv_order, (n1, n2) = _prepare(
        feats, rois_f, strides, finest_scale, p, s, pad_min=pad_min,
        r_std=None if not split else r_std)
    # with the big-window pass on, only tier-2 (ext > _B_EXT) rois
    # still need the XLA exact tail; tier-1 get exact big windows.
    # Overflow guard: if the tier>=1 block is longer than the big
    # suffix, the overflow tier-1 rois sit just before it in sorted
    # order and would otherwise be served by the std pass with
    # clamped windows — expand the exact tail to cover the whole
    # tier>=1 block (n1 counts tier>=1, so it reaches them; the
    # switch saturates at the static n_fb cap like the big-off path)
    n_need = jnp.where(n1 > n_big, n1, n2) if n_big else n1

    ik_ss = (s * s) if _a_inkernel() else 0
    if r_std:
        pooled = _pallas_pool(a, meta1, meta2, fp, rb, interpret,
                              inkernel_ss=ik_ss)       # [r_std,PP,Cp]
    else:
        pooled = None

    if n_big:
        # big-window pass over the sorted suffix: exact for tier-1
        # (long-aspect) rois; recomputes any tier-0 rois in the
        # suffix identically
        ros_b = ros[r - n_big:]
        lvl_b = lvl_s[r - n_big:]
        h_tab = jnp.asarray([f.shape[1] for f in feats], jnp.int32)
        w_tab = jnp.asarray([f.shape[2] for f in feats], jnp.int32)
        hp_tab = jnp.asarray([f.shape[1] for f in fp], jnp.int32)
        wp_tab = jnp.asarray([f.shape[2] for f in fp], jnp.int32)
        x, y, live, (cx, cy, _, _, _, _) = _sample_coords(
            ros_b, lvl_b, strides, h_tab, w_tab, p, s)
        y0 = jnp.clip(jnp.floor(cy).astype(jnp.int32) - (BWIN_H // 2 - 1),
                      0, hp_tab[lvl_b] - BWIN_H)
        x0 = (jnp.floor(cx).astype(jnp.int32) - (BWIN_H // 2 - 1)) \
            // X_ALIGN * X_ALIGN
        x0 = jnp.clip(x0, 0, wp_tab[lvl_b] - BWIN_W)
        sx = jnp.clip(x - x0[:, None, None].astype(x.dtype), 0.0,
                      BWIN_W - 1.0)
        sy = jnp.clip(y - y0[:, None, None].astype(y.dtype), 0.0,
                      BWIN_H - 1.0)
        sx = jnp.where(live, sx, -10.0)
        if ik_ss:
            a_b = jnp.stack([sx, sy], axis=1)
        else:
            a_b = _build_a(sx, sy, BWIN_H, BWIN_W, s, fp[0].dtype)
        b_idx = jnp.clip(ros_b[:, 0].astype(jnp.int32), 0,
                         fp[0].shape[0] - 1)
        meta1_b = (b_idx * num_levels + lvl_b) * 4
        meta2_b = y0 * 8192 + x0
        pooled_b = _pallas_pool(
            a_b, meta1_b, meta2_b, fp, 1, interpret,
            win_h=BWIN_H, win_w=BWIN_W, x_align=X_ALIGN, sub=None,
            inkernel_ss=ik_ss)
        if pooled is None:
            pooled = pooled_b
        elif r_std < r:
            pooled = jnp.concatenate(
                [pooled[:r - n_big], pooled_b], axis=0)
        else:
            pooled = pooled.at[r - n_big:].set(pooled_b)

    pooled = pooled[..., :c]

    caps = _fb_caps(r, rb, fallback_frac)
    n_fb = caps[-1]
    if n_fb:
        # pay-per-use exact tail: the switch's branches each run the
        # XLA gather path at a static capacity; only the selected one
        # executes. Branch results are tail-sized (not the full pooled
        # tensor) so the conditional carries ~cap*PP*C, not R*PP*C.
        tail_pooled = pooled[r - n_fb:]

        def mk_branch(cap):
            def br(tp):
                if cap == 0:
                    return tp
                tail = ros[r - cap:]
                fb = roi_align_rotated_pyramid(
                    feats, tail, p, strides=tuple(strides),
                    sampling_ratio=s, finest_scale=float(finest_scale))
                return tp.at[n_fb - cap:].set(
                    fb.reshape(cap, p * p, c).astype(tp.dtype))
            return br

        sel = _fb_select(caps, n_need)
        tail_pooled = jax.lax.switch(
            sel, [mk_branch(cc) for cc in caps], tail_pooled)
        pooled = pooled.at[r - n_fb:].set(tail_pooled)

    out = pooled[inv_order][:r0]
    return out.reshape(r0, p, p, c)


@functools.partial(
    jax.custom_vjp,
    nondiff_argnums=(2, 3, 4, 5, 6, 7, 8, 9))
def roi_align_rotated_pyramid_pallas(feats, rois, output_size: int = 7,
                                     strides=(4, 8, 16, 32),
                                     sampling_ratio: int = 2,
                                     finest_scale: float = 56.0,
                                     fallback_frac: float = 0.125,
                                     rois_per_program: int = 4,
                                     interpret: bool = False,
                                     big_frac: float = 0.0):
    """Drop-in replacement for ``roi_align_rotated_pyramid`` (same
    args/semantics) with a Pallas window+MXU forward; the backward pass
    reuses the XLA gather path's autodiff."""
    return _pyramid_pallas_impl(
        list(feats), rois, output_size, tuple(strides), sampling_ratio,
        finest_scale, fallback_frac, rois_per_program, interpret,
        big_frac=big_frac)


def _pallas_fwd(feats, rois, output_size, strides, sampling_ratio,
                finest_scale, fallback_frac, rois_per_program, interpret,
                big_frac):
    out = _pyramid_pallas_impl(
        list(feats), rois, output_size, tuple(strides), sampling_ratio,
        finest_scale, fallback_frac, rois_per_program, interpret,
        big_frac=big_frac)
    return out, (list(feats), rois)


def _scatter_kernel(img_ref, meta_ref, a_ref, g_ref, *rest,
                    num_levels: int, rb: int, u8: bool):
    """A^T window scatter: per roi, ``wg = A^T @ g`` lands additively
    in a per-image VMEM pyramid accumulator; on image change the
    accumulator is flushed to the per-level HBM outputs. Grid programs
    run sequentially on a TensorCore, so VMEM read-modify-write needs
    no atomics."""
    out_refs = rest[:num_levels]
    scr = rest[num_levels:2 * num_levels]
    sems = rest[2 * num_levels]

    i = pl.program_id(0)
    nprog = pl.num_programs(0)

    def zero_scr():
        for l in range(num_levels):
            scr[l][...] = jnp.zeros(scr[l].shape, scr[l].dtype)

    def flush(img):
        for l in range(num_levels):
            pltpu.make_async_copy(scr[l], out_refs[l].at[img],
                                  sems.at[l]).start()
        for l in range(num_levels):
            pltpu.make_async_copy(scr[l], out_refs[l].at[img],
                                  sems.at[l]).wait()

    @pl.when(i == 0)
    def _():
        zero_scr()

    cur = img_ref[i]

    @pl.when(i > 0)
    def _():
        prev = img_ref[i - 1]

        @pl.when(cur != prev)
        def _():
            flush(prev)
            zero_scr()

    for k in range(rb):
        m = meta_ref[i * rb + k]
        lvl = m // (8192 * 8192)
        rem = m - lvl * 8192 * 8192
        y0 = rem // 8192
        x0 = rem - y0 * 8192
        a = a_ref[k]                                     # [PP, AREA]
        if u8:
            a = a.astype(jnp.int32).astype(jnp.float32)
        else:
            a = a.astype(jnp.float32)
        gk = g_ref[k].astype(jnp.float32)                # [PP, C]
        wg = jax.lax.dot_general(
            a, gk, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)          # [AREA, C]
        if u8:
            wg = wg * (1.0 / 255.0)
        for l in range(num_levels):
            @pl.when(lvl == l)
            def _(l=l):
                win_hw = wg.reshape(WIN_H, WIN_W,
                                    gk.shape[-1]).astype(scr[l].dtype)
                sl = (pl.ds(y0, WIN_H),
                      pl.ds(pl.multiple_of(x0, X_ALIGN), WIN_W),
                      slice(None))
                scr[l][sl] = scr[l][sl] + win_hw

    @pl.when(i == nprog - 1)
    def _():
        flush(cur)


def _pallas_scatter(a, meta, img_prog, g, level_shapes, n_img: int,
                    rb: int, dt, interpret: bool):
    """a: [CAP, PP, AREA]; meta: [CAP] int32 (lvl*2^26+y0*2^13+x0);
    img_prog: [CAP//rb] int32 (image of each program, non-decreasing);
    g: [CAP, PP, Cp]. Returns per-level [n_img, Hp, Wp, Cp] gradient
    accumulations in dtype ``dt``."""
    num_levels = len(level_shapes)
    cap, pp, area = a.shape
    cp = g.shape[-1]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(cap // rb,),
        in_specs=[
            pl.BlockSpec((rb, pp, area), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rb, pp, cp), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[pl.BlockSpec(memory_space=pl.ANY)] * num_levels,
        scratch_shapes=[pltpu.VMEM((hp, wp, cp), dt)
                        for hp, wp in level_shapes]
        + [pltpu.SemaphoreType.DMA((num_levels,))],
    )
    scr_bytes = sum(hp * wp * cp for hp, wp in level_shapes) \
        * jnp.dtype(dt).itemsize
    blk_bytes = 2 * rb * pp * (area * jnp.dtype(a.dtype).itemsize
                               + cp * jnp.dtype(dt).itemsize)
    return pl.pallas_call(
        functools.partial(_scatter_kernel, num_levels=num_levels,
                          rb=rb, u8=a.dtype == jnp.uint8),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((n_img, hp, wp, cp), dt)
                   for hp, wp in level_shapes],
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            vmem_limit_bytes=min(scr_bytes + blk_bytes
                                 + 8 * 1024 * 1024,
                                 110 * 1024 * 1024)),
        interpret=interpret,
    )(img_prog, meta, a, g)


def _pyramid_pallas_bwd_impl(feats, rois, g, output_size: int, strides,
                             sampling_ratio: int, finest_scale: float,
                             fallback_frac: float,
                             rois_per_program: int, interpret: bool):
    """d_feats for the Pallas forward: A^T window scatter for every
    windowed roi (exact adjoint — the same A the forward applied,
    including its u8 quantization on the bf16 path), plus the XLA
    path's vjp restricted to the forward's fallback-tail roi subset.

    d_rois is zero: rois reach this op detached in the train graph
    (proposals are decoded from stop_gradient'ed RPN outputs,
    networks/rcnn.py:112; gt-as-proposals carry no grad). Reference
    parity: the CUDA kernel also returns no roi grads
    (``roi_align_rotated_v1.py:351``)."""
    p, s = output_size, sampling_ratio
    num_levels = len(strides)
    feats = list(feats)[:num_levels]
    c = feats[0].shape[-1]
    n_img = feats[0].shape[0]
    dt = feats[0].dtype
    rbf = rois_per_program
    r0 = rois.shape[0]
    r = r0 + (-r0) % rbf
    rois_f = rois.astype(jnp.float32)
    g = g.reshape(r0, p * p, c).astype(dt)
    if r != r0:
        rois_f = jnp.pad(rois_f, ((0, r - r0), (0, 0)))
        g = jnp.pad(g, ((0, r - r0), (0, 0), (0, 0)))

    order, lvl, tier, _, _, _ = _fwd_order(
        rois_f, strides, finest_scale, num_levels)

    # the forward overwrote a pay-per-use sorted tail with the XLA
    # gather path — the SAME bucket (same _fb_caps + tier count) of
    # rois backprops through the XLA vjp here, the rest through the
    # A^T scatter kernel
    caps = _fb_caps(r, rbf, fallback_frac)
    n_fb = caps[-1]
    d_feats_fb = None
    if n_fb:
        def mk_branch(cap):
            def br(g_in):
                if cap == 0:
                    return ([jnp.zeros_like(f) for f in feats], g_in)
                idx_fb = order[r - cap:]
                rois_fb = rois_f[idx_fb]
                g_fb = g_in[idx_fb]
                _, vjp = jax.vjp(
                    lambda f: roi_align_rotated_pyramid(
                        f, rois_fb, p, strides=tuple(strides),
                        sampling_ratio=s,
                        finest_scale=float(finest_scale)),
                    feats)
                (d_fb,) = vjp(g_fb.reshape(cap, p, p, c).astype(dt))
                mask = jnp.zeros((r,), bool).at[idx_fb].set(True)
                return (list(d_fb),
                        jnp.where(mask[:, None, None], 0, g_in))
            return br

        n_need = jnp.sum((tier >= 1).astype(jnp.int32))
        sel = _fb_select(caps, n_need)
        d_feats_fb, g = jax.lax.switch(
            sel, [mk_branch(cc) for cc in caps], g)

    # window meta + A for every roi, full-window base (identical
    # weights to the forward's small/micro sub-window placements, and
    # identical clamping for oversize tier-1 rois)
    h_tab = jnp.asarray([f.shape[1] for f in feats], jnp.int32)
    w_tab = jnp.asarray([f.shape[2] for f in feats], jnp.int32)
    def _padded_shape(f):
        n_, h_, w_, c_ = f.shape
        hp = max(WIN_H, h_)
        wp = max(WIN_W, w_)
        wp = wp + (-wp) % X_ALIGN
        return (n_, hp, wp, c_ + (-c_) % 128)

    fp_shapes = [_padded_shape(f) for f in feats]
    hp_tab = jnp.asarray([sh[1] for sh in fp_shapes], jnp.int32)
    wp_tab = jnp.asarray([sh[2] for sh in fp_shapes], jnp.int32)
    x, y, live, (cx, cy, _, _, _, _) = _sample_coords(
        rois_f, lvl, strides, h_tab, w_tab, p, s)
    cyi = jnp.floor(cy).astype(jnp.int32)
    cxi = jnp.floor(cx).astype(jnp.int32)
    y0 = jnp.clip(cyi - (WIN_H // 2 - 1), 0, hp_tab[lvl] - WIN_H)
    x0 = jnp.clip((cxi - (WIN_H // 2 - 1)) // X_ALIGN * X_ALIGN,
                  0, wp_tab[lvl] - WIN_W)
    sx = jnp.clip(x - x0[:, None, None].astype(x.dtype), 0.0,
                  WIN_W - 1.0)
    sy = jnp.clip(y - y0[:, None, None].astype(y.dtype), 0.0,
                  WIN_H - 1.0)
    sx = jnp.where(live, sx, -10.0)
    a = _build_a(sx, sy, WIN_H, WIN_W, s, dt)
    meta = (lvl * 8192 + y0) * 8192 + x0

    # pack rois into per-image segments (rb-aligned) so the kernel's
    # per-image accumulator flushes exactly once per image
    rb = rbf
    b_idx = jnp.clip(rois_f[:, 0].astype(jnp.int32), 0, n_img - 1)
    sort_b = jnp.argsort(b_idx)
    counts = jnp.bincount(b_idx, length=n_img)
    cap_img = jnp.maximum(rb, ((counts + rb - 1) // rb) * rb)
    bounds = jnp.cumsum(cap_img)
    seg_start = bounds - cap_img
    src_start = jnp.cumsum(counts) - counts
    sb = b_idx[sort_b]
    dest = seg_start[sb] + (jnp.arange(r) - src_start[sb])
    cap_total = r + n_img * rb                      # static upper bound

    cpad = (-c) % 128
    cp = c + cpad
    if cpad:
        g = jnp.pad(g, ((0, 0), (0, 0), (0, cpad)))
    a_pk = jnp.zeros((cap_total,) + a.shape[1:], a.dtype) \
        .at[dest].set(a[sort_b])
    g_pk = jnp.zeros((cap_total, p * p, cp), g.dtype) \
        .at[dest].set(g[sort_b])
    m_pk = jnp.zeros((cap_total,), jnp.int32).at[dest].set(meta[sort_b])
    img_slot = jnp.searchsorted(bounds, jnp.arange(cap_total),
                                side="right")
    img_prog = jnp.clip(img_slot[::rb], 0, n_img - 1).astype(jnp.int32)

    level_shapes = [(sh[1], sh[2]) for sh in fp_shapes]
    d_lvls = _pallas_scatter(a_pk, m_pk, img_prog, g_pk, level_shapes,
                             n_img, rb, dt, interpret)

    d_feats = []
    for l, f in enumerate(feats):
        d = d_lvls[l][:, :f.shape[1], :f.shape[2], :c]
        if d_feats_fb is not None:
            d = d + d_feats_fb[l]
        d_feats.append(d.astype(dt))
    return d_feats, jnp.zeros_like(rois)


def _pallas_bwd(output_size, strides, sampling_ratio, finest_scale,
                fallback_frac, rois_per_program, interpret, big_frac,
                res, g):
    feats, rois = res
    # the A^T scatter kernel covers the standard-window tiers; the
    # big-window pass (big_frac > 0, off by default) and the explicit
    # opt-out fall back to the XLA path's full vjp
    if big_frac <= 0 and os.environ.get("RS_ROI_PALLAS_BWD", "1") != "0":
        return tuple(_pyramid_pallas_bwd_impl(
            feats, rois, g, output_size, tuple(strides), sampling_ratio,
            finest_scale, fallback_frac, rois_per_program, interpret))
    _, vjp = jax.vjp(
        lambda f, rr: roi_align_rotated_pyramid(
            f, rr, output_size, strides=tuple(strides),
            sampling_ratio=sampling_ratio,
            finest_scale=float(finest_scale)),
        feats, rois)
    d_feats, d_rois = vjp(g.astype(feats[0].dtype))
    return d_feats, d_rois


roi_align_rotated_pyramid_pallas.defvjp(_pallas_fwd, _pallas_bwd)
