"""Fused VAN spatial-attention half-block:
``x + ls1 * proj_2(gelu(proj_1(bn1(x))) * conv1(dw7d3(dw5(gelu(proj_1(bn1(x)))))))``.

XLA runs this chain as ~8 separate HBM passes, and its grouped
depthwise convs reach only ~130 GB/s effective (measured,
docs/perf_notes.md) — the chain is the single largest cost in the
VAN-b3 backbone. This kernel processes one row block per program with
an 11-row/col halo (2 for the 5x5 dw + 9 for the dilated-3 7x7 dw),
keeping every intermediate in VMEM: the only HBM traffic is read-x +
write-out.

Semantics match ``models/backbones/van.py`` exactly: eval-mode
BatchNorm folded to an affine (a1, b1), exact-erf gelu (A&S
polynomial), SAME zero padding applied to each depthwise input at the
image border (masked in-kernel), layer-scale + residual fused into the
output write. Inference-only — training uses the XLA composition.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .activations import exact_gelu

HALO = 11   # 2 (dw5) + 9 (dw7 dilation 3)


def _sa_core(h, wp1, bp1, wdw5, bdw5, wdw7, bdw7, wc1, bc1, wp2, bp2,
             train: bool = False):
    """SpatialAttention body on a pre-normed input ``h``:
    ``proj_2(gelu(proj_1(h)) * conv1(dw7d3(dw5(gelu(proj_1(h)))))) + h``
    (the module's inner shortcut included, reference van.py:197-213).

    Weight layouts: wp1/wc1/wp2 [C, C]; wdw5 [25, C]; wdw7 [49, C].
    Serving int8 (RS_INT8=1): the three channel-mixing projections run
    as s8xs8->s32 MXU ops; the depthwise convs stay in the input dtype.
    """
    from .quant import int8_channel_matmul, int8_enabled

    c = h.shape[-1]
    dt = h.dtype
    if int8_enabled(train):
        def mix(x, w, b):
            return int8_channel_matmul(x, w, b)
    else:
        def mix(x, w, b):
            return jnp.einsum("nhwc,cd->nhwd", x,
                              w.astype(x.dtype)) + b.astype(x.dtype)
    g = exact_gelu(mix(h, wp1, bp1))
    from .dw_conv import dw_conv, tap_bwd_enabled

    if tap_bwd_enabled():
        d5 = dw_conv(g, wdw5.reshape(5, 5, 1, c).astype(dt), 1) \
            + bdw5.astype(dt)
        d7 = dw_conv(d5, wdw7.reshape(7, 7, 1, c).astype(dt), 3) \
            + bdw7.astype(dt)
    else:
        d5 = jax.lax.conv_general_dilated(
            g, wdw5.reshape(5, 5, 1, c).astype(dt), (1, 1),
            [(2, 2), (2, 2)], feature_group_count=c,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=dt) + bdw5.astype(dt)
        d7 = jax.lax.conv_general_dilated(
            d5, wdw7.reshape(7, 7, 1, c).astype(dt), (1, 1),
            [(9, 9), (9, 9)], rhs_dilation=(3, 3), feature_group_count=c,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=dt) + bdw7.astype(dt)
    c1 = mix(d7, wc1, bc1)
    p2 = mix(g * c1, wp2, bp2)
    return p2 + h


def _ref_attn(x, a1, b1, wp1, bp1, wdw5, bdw5, wdw7, bdw7, wc1, bc1,
              wp2, bp2, ls1):
    """Full fused-path reference: bn1 affine + attention body +
    layer-scale + block residual (what the kernel computes)."""
    h = (x.astype(jnp.float32) * a1 + b1).astype(x.dtype)
    sa = _sa_core(h, wp1, bp1, wdw5, bdw5, wdw7, bdw7, wc1, bc1, wp2,
                  bp2)
    return x + (ls1.astype(x.dtype) * sa)


def _attn_kernel(xp_hbm, vec_ref, wp1_ref, wdw5_ref, wdw7_ref, wc1_ref,
                 wp2_ref, out_ref, xbuf, g_ref, d5_ref, sems, *,
                 bh: int, h: int, w: int, wp: int, c: int):
    j = pl.program_id(1)
    n_i = pl.program_id(0)
    nj = pl.num_programs(1)
    rows = bh + 2 * HALO

    def dma(prog_n, prog_j, slot):
        return pltpu.make_async_copy(
            xp_hbm.at[prog_n, pl.ds(prog_j * bh, rows)],
            xbuf.at[slot], sems.at[slot])

    slot = jax.lax.rem(j, 2)
    nslot = jax.lax.rem(j + 1, 2)

    @pl.when(j == 0)
    def _():
        dma(n_i, 0, 0).start()

    @pl.when(j + 1 < nj)
    def _():
        dma(n_i, j + 1, nslot).start()

    dma(n_i, j, slot).wait()

    f32 = jnp.float32
    xv = xbuf[slot]                                   # [rows, wp, C]
    a1 = vec_ref[0].astype(f32)
    b1 = vec_ref[1].astype(f32)
    bp1 = vec_ref[2].astype(f32)
    bdw5 = vec_ref[3].astype(f32)
    bdw7 = vec_ref[4].astype(f32)
    bc1 = vec_ref[5].astype(f32)
    bp2 = vec_ref[6].astype(f32)
    ls1 = vec_ref[7].astype(f32)

    # image-validity mask over the haloed block (SAME conv zero
    # padding: every depthwise INPUT is zero outside the image)
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (rows, wp, 1), 0) \
        + j * bh
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (rows, wp, 1), 1)
    valid = ((row_ids >= HALO) & (row_ids < h + HALO)
             & (col_ids >= HALO) & (col_ids < w + HALO))

    # bn1 affine + proj_1 + gelu on the fully haloed block (bf16
    # storage — matches the XLA path's bf16 normalize and keeps
    # Mosaic's live set small; the tap accumulators below are f32)
    xb = (xv.astype(f32) * a1 + b1).astype(xv.dtype)
    g = jnp.dot(xb.reshape(rows * wp, c), wp1_ref[:],
                preferred_element_type=f32) + bp1
    g = exact_gelu(g.astype(xv.dtype)).reshape(rows, wp, c)
    # stage g in scratch VMEM: the tap loops below then read SLICES of
    # a ref (one load live at a time) instead of slicing one big SSA
    # value — a fully unrolled 25/49-tap value chain made Mosaic's
    # register allocator spill ~90 MB (measured OOM at stage-1 shapes)
    g_ref[...] = jnp.where(valid, g, 0)

    # dw5 (SAME): valid output region shrinks by 2 per side; compute
    # on the d5-needed region [rows-4, wp-4] starting at offset 2.
    # dx (sublane-dim) slices are relayouts: load each ONCE from the
    # scratch ref (bounded liveness) and reuse for all dy taps
    # (leading-dim slices are free). Accumulate in the compute dtype —
    # bf16 MACs run 2x the f32 VPU rate and XLA's grouped conv is
    # bf16 end-to-end here too (excess-precision mode).
    cdt = xv.dtype
    wdw5 = wdw5_ref[:].astype(cdt)
    r5 = rows - 4
    w5 = wp - 4
    acc = None
    for dx in range(5):
        sxd = g_ref[:, dx:dx + w5]                     # one relayout
        for dy in range(5):
            tap = sxd[dy:dy + r5] * wdw5[dy * 5 + dx]
            acc = tap if acc is None else acc + tap
    d5 = acc + bdw5.astype(cdt)
    # zero outside the image before dw7 (dw7's SAME pad sees zeros)
    d5_ref[...] = jnp.where(valid[2:2 + r5, 2:2 + w5], d5, 0)

    # dw7 dilation 3 (SAME): consumes the remaining 9-halo
    wdw7 = wdw7_ref[:].astype(cdt)
    acc = None
    for dx in range(7):
        sxd = d5_ref[:, dx * 3:dx * 3 + w]             # one relayout
        for dy in range(7):
            tap = sxd[dy * 3:dy * 3 + bh] * wdw7[dy * 7 + dx]
            acc = tap if acc is None else acc + tap
    d7 = acc + bdw7.astype(cdt)                        # [bh, w, C]
    g = g_ref[...]

    # conv1 (1x1), gate by g, proj_2; sa = p2 + h (inner shortcut);
    # out = x + ls1 * sa (layer-scale + block residual)
    c1 = jnp.dot(d7.reshape(bh * w, c), wc1_ref[:],
                 preferred_element_type=f32) + bc1
    g_c = g[HALO:HALO + bh, HALO:HALO + w].astype(f32) \
        .reshape(bh * w, c)
    a = (g_c * c1).astype(xv.dtype)
    p2 = jnp.dot(a, wp2_ref[:], preferred_element_type=f32) + bp2
    h_c = xb[HALO:HALO + bh, HALO:HALO + w].astype(f32) \
        .reshape(bh * w, c)
    sa = p2 + h_c
    out = xv[HALO:HALO + bh, HALO:HALO + w].astype(f32) \
        .reshape(bh * w, c) + ls1 * sa
    out_ref[0] = out.reshape(bh, w, c).astype(out_ref.dtype)


def van_attn(x, a1, b1, wp1, bp1, wdw5, bdw5, wdw7, bdw7, wc1, bc1,
             wp2, bp2, ls1, block_rows: int = 32,
             interpret: bool | None = None):
    """Fused attention half-block: [N, H, W, C] -> [N, H, W, C].

    Channel dim is padded to a 128 multiple internally (weights
    zero-padded so the extra lanes stay zero)."""
    n, h, w, c = x.shape
    cpad = (-c) % 128
    cin = c + cpad
    dt = x.dtype

    def padc(v, extra=0.0):
        return jnp.pad(v, (0, cpad), constant_values=extra)

    def padm(m, rows_only=False):
        return jnp.pad(m, ((0, cpad), (0, 0 if rows_only else cpad)))

    if cpad:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, cpad)))
        a1 = padc(a1)
        b1 = padc(b1)
        bp1 = padc(bp1)
        bdw5 = padc(bdw5)
        bdw7 = padc(bdw7)
        bc1 = padc(bc1)
        bp2 = padc(bp2)
        ls1 = padc(ls1)
        wp1 = padm(wp1)
        wc1 = padm(wc1)
        wp2 = padm(wp2)
        wdw5 = jnp.pad(wdw5, ((0, 0), (0, cpad)))
        wdw7 = jnp.pad(wdw7, ((0, 0), (0, cpad)))

    vecs = jnp.stack([a1, b1, bp1, bdw5, bdw7, bc1, bp2, ls1]) \
        .astype(jnp.float32)

    wp = w + 2 * HALO + (-(w + 2 * HALO)) % 16
    # adaptive block height: cap the haloed block footprint
    # (rows * wp * cin * 2B) at ~4.2 MB per buffer — large blocks
    # amortize the halo overcompute (rows/bh) while staying inside
    # VMEM now that tap liveness is bounded by the scratch-ref loads
    max_rows = max(2 * HALO + 4, int(2_900_000 / (wp * cin * 2)))
    bh = min(block_rows, max(4, max_rows - 2 * HALO), h)
    hpad = (-h) % bh
    xp = jnp.pad(x, ((0, 0), (HALO, HALO + hpad),
                     (HALO, wp - w - HALO), (0, 0)))
    grid = (n, (h + hpad) // bh)
    rows = bh + 2 * HALO

    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    out = pl.pallas_call(
        functools.partial(_attn_kernel, bh=bh, h=h, w=w, wp=wp, c=cin),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((8, cin), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cin, cin), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((25, cin), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((49, cin), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cin, cin), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cin, cin), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bh, w, cin),
                               lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, h + hpad, w, cin), dt),
        scratch_shapes=[
            pltpu.VMEM((2, rows, wp, cin), dt),
            pltpu.VMEM((rows, wp, cin), dt),            # g
            pltpu.VMEM((rows - 4, wp - 4, cin), dt),    # d5
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            # the tap accumulator chains legitimately hold tens of
            # MB of scoped VMEM at stage-1 shapes; default limit 16M
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(xp, vecs, wp1.astype(dt), wdw5.astype(dt), wdw7.astype(dt),
      wc1.astype(dt), wp2.astype(dt))
    return out[:, :h, :, :c]
