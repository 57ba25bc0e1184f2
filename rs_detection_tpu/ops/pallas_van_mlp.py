"""Fused VAN MLP: fc1 (1x1) -> depthwise 3x3 -> GELU -> fc2 (1x1).

VAN spends most of its backbone time in the block MLPs (measured
41.6 ms of a 70.5 ms backbone at batch 8 / 1024^2 —
tools/analysis_tools/van_mlp_microbench.py): the 4x-hidden tensor
makes four HBM trips between fc1, the depthwise conv, and fc2
(~20 GB/iter for VAN-b3). This kernel keeps the hidden tensor in VMEM:
each program DMAs a row block of x (1-row halo), runs fc1 on the MXU,
the 9-tap depthwise + GELU on the VPU, and fc2 on the MXU — HBM
traffic drops to read-x + write-out.

Semantics match the XLA path in ``models/backbones/van.py:Mlp``
(reference ``python/jdet/models/backbones/van.py:216-243``): SAME
zero-padding on the *hidden* tensor for the depthwise conv, biases on
all three convs, flax-default approximate GELU. Backward falls back to
the XLA composition via ``jax.custom_vjp``.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .activations import _erf_as, exact_gelu


def _ref_mlp(x, w1, b1, wdw, bdw, w2, b2):
    """Pure-XLA reference composition (also the custom_vjp bwd)."""
    from .dw_conv import dw_conv, tap_bwd_enabled

    h = jnp.einsum("nhwc,cd->nhwd", x, w1) + b1
    c = h.shape[-1]
    if tap_bwd_enabled():
        h = dw_conv(h, wdw.reshape(3, 3, 1, c), 1) + bdw
    else:
        h = jax.lax.conv_general_dilated(
            h, wdw.reshape(3, 3, 1, c), (1, 1), [(1, 1), (1, 1)],
            feature_group_count=c,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=h.dtype) + bdw
    h = exact_gelu(h)  # erf gelu (torch/jittor semantics, fast form)
    return jnp.einsum("nhwd,dc->nhwc", h, w2) + b2


def _int8_mlp(x, w1, b1, wdw, bdw, w2, b2):
    """Serving-int8 XLA composition (RS_INT8=1): fc1/fc2 run as
    s8xs8->s32 MXU ops with dynamic per-tensor activation scales; the
    depthwise conv and gelu stay in the input dtype (ops/quant.py)."""
    from .quant import int8_channel_matmul

    h = int8_channel_matmul(x, w1, b1)
    c = h.shape[-1]
    h = jax.lax.conv_general_dilated(
        h, wdw.reshape(3, 3, 1, c).astype(h.dtype), (1, 1),
        [(1, 1), (1, 1)], feature_group_count=c,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=h.dtype) + bdw.astype(h.dtype)
    h = exact_gelu(h)
    return int8_channel_matmul(h, w2, b2)


def _mlp_kernel(xp_hbm, w1_ref, b1_ref, wdw_ref, bdw_ref, w2_ref,
                b2_ref, sw1_ref, sw2_ref, out_ref, xbuf, sems, *,
                bh: int, h: int, w: int, wp: int, c: int, ch: int,
                residual: bool = False, split: int = 1,
                quant: bool = False):
    n_i = pl.program_id(0)
    j = pl.program_id(1)
    nj = pl.num_programs(1)
    rows = bh + 2

    def dma(prog_n, prog_j, slot):
        return pltpu.make_async_copy(
            xp_hbm.at[prog_n, pl.ds(prog_j * bh, rows)],
            xbuf.at[slot], sems.at[slot])

    slot = jax.lax.rem(j, 2)
    nslot = jax.lax.rem(j + 1, 2)

    @pl.when(j == 0)
    def _():
        dma(n_i, 0, 0).start()

    # prefetch the next row block (same image; across images the first
    # block restarts the pipeline)
    @pl.when(j + 1 < nj)
    def _():
        dma(n_i, j + 1, nslot).start()

    dma(n_i, j, slot).wait()

    f32 = jnp.float32
    xv = xbuf[slot]                                     # [rows, wp, Cin]

    def _qdot(xs2, w_ref, s_ref):
        """Per-block dynamic int8 quantization + s8xs8->s32 MXU dot
        (serving int8 mode): xs2 f32 [M, K], w_ref int8 [K, N],
        s_ref [1, N] per-out-channel weight scales. Returns f32."""
        ax = jnp.max(jnp.abs(xs2))
        sx = jnp.where(ax > 0, ax / 127.0, 1.0)
        xq = jnp.clip(jnp.round(xs2 * (1.0 / sx)),
                      -127.0, 127.0).astype(jnp.int8)
        acc = jnp.dot(xq, w_ref[:], preferred_element_type=jnp.int32)
        return acc.astype(f32) * (sx * s_ref[0])

    def fc1(r0, nr):
        """fc1 + bias + SAME-pad zeroing for hidden rows [r0, r0+nr)
        of this block's (bh + 2)-row haloed window."""
        xs = xv[r0:r0 + nr]
        xs2 = xs.reshape(nr * wp, xs.shape[-1])
        if quant:
            h1 = _qdot(xs2.astype(f32), w1_ref, sw1_ref)
        else:
            h1 = jnp.dot(xs2, w1_ref[:], preferred_element_type=f32)
        h1 = (h1 + b1_ref[0].astype(f32)).astype(xv.dtype) \
            .reshape(nr, wp, ch)
        # zero the dw conv's SAME padding on the HIDDEN tensor: fc1 of
        # a zero-padded x row/col is bias, not zero
        row_ids = jax.lax.broadcasted_iota(jnp.int32, (nr, wp, 1), 0) \
            + j * bh + r0
        col_ids = jax.lax.broadcasted_iota(jnp.int32, (nr, wp, 1), 1)
        valid = ((row_ids >= 1) & (row_ids <= h)
                 & (col_ids >= 1) & (col_ids <= w))
        return jnp.where(valid, h1, 0)

    wdw = wdw_ref[:].astype(f32)                        # [9, Ch]

    # tap/accumulate dtype for the 9-tap dw. bf16 taps were tried
    # (they match the XLA path's own bf16 accumulation and bf16 MACs
    # nominally retire 2x f32) and MEASURED SLOWER on v5e: 69.8 vs
    # 61.8 ms stage-stacked (round-4 A/B, round4_mlp_ab.py) — the
    # un-converted tap slices keep whole bf16 hidden views live as
    # register copies (21M scoped VMEM) and Mosaic's bf16 select/add
    # mix doesn't reach the 2x rate. f32 stays the default; bf16 is
    # RS_VAN_MLP_BF16_TAPS=1 for future re-measurement.
    tap_f32 = os.environ.get("RS_VAN_MLP_BF16_TAPS", "0") != "1"
    tdt = f32 if tap_f32 else xv.dtype
    wdw_t = wdw.astype(tdt)

    def dw_gelu_fc2(h1, nr):
        """9-tap dw + exact gelu + fc2 over nr OUTPUT rows given the
        (nr + 2)-row hidden slab h1."""
        acc = None
        # dx (sublane) shifts are relayouts — hoist them so each of
        # the 3 shifted copies serves all 3 dy-taps (leading-dim
        # slices are free)
        for dx in range(3):
            sxd = h1[:, dx:dx + w].astype(tdt)          # [nr+2, w, Ch]
            for dy in range(3):
                tap = sxd[dy:dy + nr] * wdw_t[dy * 3 + dx]
                acc = tap if acc is None else acc + tap
        # exact (erf) gelu in f32: Mosaic lowers neither erf nor
        # erfc; _erf_as is the shared A&S 7.1.26 polynomial (max err
        # 1.5e-7 — below bf16 resolution, i.e. bit-identical to exact
        # after cast) and is pure jnp, so it inlines into the kernel
        hpre = acc.astype(f32) + bdw_ref[0].astype(f32)
        erf = _erf_as(hpre * np.float32(0.7071067811865476))
        if quant:
            h2 = (hpre * 0.5 * (1.0 + erf)).reshape(nr * w, ch)
            out = _qdot(h2, w2_ref, sw2_ref)
        else:
            h2 = (hpre * 0.5 * (1.0 + erf)).astype(xv.dtype)
            out = jnp.dot(h2.reshape(nr * w, ch), w2_ref[:],
                          preferred_element_type=f32)
        return out + b2_ref[0].astype(f32)

    if split <= 1:
        h1 = fc1(0, rows)
        out = dw_gelu_fc2(h1, bh).reshape(bh, w, c)
    else:
        # split-phase software pipeline: issue fc1 (MXU) of half k+1
        # before the dw/gelu (VPU) of half k so Mosaic's scheduler can
        # dual-issue the independent matrix and vector chains
        hb = bh // 2
        h1a = fc1(0, hb + 2)
        h1b = fc1(hb, rows - hb)
        outa = dw_gelu_fc2(h1a, hb)
        outb = dw_gelu_fc2(h1b, bh - hb)
        out = jnp.concatenate([outa.reshape(hb, w, c),
                               outb.reshape(bh - hb, w, c)], axis=0)
    if residual:
        # the block's residual add rides along for free: the x block
        # (center rows/cols, un-padded channels) is already in VMEM
        out = out + xv[1:1 + bh, 1:1 + w, :c].astype(f32)
    out_ref[0] = out.astype(out_ref.dtype)


def _van_mlp_fwd_impl(x, w1, b1, wdw, bdw, w2, b2, residual=False):
    n, h, w, c = x.shape
    ch = w1.shape[-1]
    # manual DMA slices need a 128-multiple lane (channel) dim — pad x
    # and w1's input rows (zero rows contribute nothing to fc1)
    cpad = (-c) % 128
    if cpad:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, cpad)))
        w1 = jnp.pad(w1, ((0, cpad), (0, 0)))
    cin = c + cpad
    # W halo of 1 zero col each side; round the padded width up to the
    # bf16 DMA tile (16) — extra cols are masked in-kernel
    wp = w + 2 + (-(w + 2)) % 16
    # block height: keep the VMEM-resident hidden block ~<= 4 MB
    bh = int(min(32, max(8, (4_000_000 // (wp * ch * 2)) // 8 * 8)))
    bh = min(bh, h)
    hpad = (-h) % bh
    xp = jnp.pad(x, ((0, 0), (1, 1 + hpad), (1, wp - w - 1), (0, 0)))
    grid = (n, (h + hpad) // bh)

    split = int(os.environ.get("RS_VAN_MLP_SPLIT", "1"))
    quant = os.environ.get("RS_INT8", "0") == "1"
    if quant:
        # per-out-channel symmetric int8 weights; activation scales
        # are computed per row block inside the kernel (finer than the
        # XLA path's per-tensor scale)
        def qw(wm):
            wf = wm.astype(jnp.float32)
            am = jnp.max(jnp.abs(wf), axis=0, keepdims=True)
            s = jnp.where(am > 0, am / 127.0, 1.0)
            q = jnp.clip(jnp.round(wf / s), -127, 127).astype(jnp.int8)
            return q, s

        w1c, sw1 = qw(w1)
        w2c, sw2 = qw(w2)
    else:
        w1c, sw1 = w1.astype(x.dtype), jnp.ones((1, ch), jnp.float32)
        w2c, sw2 = w2.astype(x.dtype), jnp.ones((1, c), jnp.float32)
    out = pl.pallas_call(
        functools.partial(_mlp_kernel, bh=bh, h=h, w=w, wp=wp, c=c,
                          ch=ch, residual=residual, split=split,
                          quant=quant),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((cin, ch), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ch), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9, ch), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ch), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ch, c), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ch), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bh, w, c), lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, h + hpad, w, c), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, bh + 2, wp, cin), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            # bf16 tap slices keep the dx-shifted hidden views live as
            # register copies (21M scoped at stage-1 shapes — past the
            # 16M default guard); the split-phase pipeline holds two
            # hidden half-slabs. v5e physical VMEM is far larger.
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=jax.default_backend() == "cpu",
    )(xp, w1c, b1.astype(jnp.float32)[None],
      wdw.astype(x.dtype), bdw.astype(jnp.float32)[None],
      w2c, b2.astype(jnp.float32)[None], sw1, sw2)
    return out[:, :h]


@jax.custom_vjp
def van_mlp(x, w1, b1, wdw, bdw, w2, b2):
    """Fused VAN MLP.

    Args:
      x: [N, H, W, C]; w1: [C, Ch]; b1: [Ch]; wdw: [9, Ch] (3x3 taps
      row-major); bdw: [Ch]; w2: [Ch, C]; b2: [C].

    Returns [N, H, W, C].
    """
    return _van_mlp_fwd_impl(x, w1, b1, wdw, bdw, w2, b2)


def _fwd(x, w1, b1, wdw, bdw, w2, b2):
    return _van_mlp_fwd_impl(x, w1, b1, wdw, bdw, w2, b2), \
        (x, w1, b1, wdw, bdw, w2, b2)


def _bwd(res, g):
    _, vjp = jax.vjp(_ref_mlp, *res)
    return vjp(g.astype(res[0].dtype))


van_mlp.defvjp(_fwd, _bwd)


def van_mlp_residual(x, w1, b1, wdw, bdw, w2, b2):
    """Inference-only fused ``x + mlp(x)`` (layer-scale pre-folded into
    w2/b2 by the caller; residual added in-kernel from the VMEM-resident
    x block). No custom vjp — training uses the XLA composition."""
    return _van_mlp_fwd_impl(x, w1, b1, wdw, bdw, w2, b2, residual=True)
