"""Pallas depthwise conv for large-kernel attention.

VAN/LSKNet spend a large share of backbone time in depthwise convs
(LKA: 5x5 dw + 7x7 dw dilated-3 per block). XLA lowers grouped convs
with group == channels poorly on TPU (~0.8 TFLOP/s measured on v5e —
see tools/analysis_tools/van_microbench.py); this kernel computes the
depthwise conv as K*K statically-unrolled shifted multiply-adds on the
VPU over VMEM-resident row blocks. Input rows live in HBM and each
program DMAs its halo window (overlapping row blocks cannot be
expressed as BlockSpecs) — the classic halo-exchange pattern from the
Pallas guide.

Forward only — the backward pass falls back to XLA's grouped-conv
gradients via ``jax.custom_vjp``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _dw_kernel(x_hbm, w_ref, out_ref, *, k: int, dilation: int,
               bh: int, halo: int):
    """x_hbm [N, Hp, Wp, C] (HBM); w [K*K, C]; out block [1, BH, W, C]."""
    n_i = pl.program_id(0)
    j = pl.program_id(1)
    wp = x_hbm.shape[2]
    c = x_hbm.shape[3]
    win_rows = bh + 2 * halo

    def body(scratch, sem):
        cp = pltpu.make_async_copy(
            x_hbm.at[n_i, pl.ds(j * bh, win_rows)], scratch, sem)
        cp.start()
        cp.wait()
        wv = w_ref[:]
        # slice the loaded VALUE, not the ref: packed-dtype (bf16) refs
        # reject odd-sublane slice offsets under Mosaic, while value
        # slices are vector relayouts. W-shifts (tiled sublane dim) are
        # the expensive relayouts, so hoist them: k shifted copies,
        # each reused across all k dy-taps (leading-dim slices of a 3D
        # value are untiled, i.e. free) — k relayouts instead of k*k.
        sv = scratch[:]
        wv = wv.astype(jnp.float32)
        acc = None
        w_out = out_ref.shape[2]
        for dx in range(k):
            sxd = sv[:, dx * dilation:dx * dilation + w_out,
                     :].astype(jnp.float32)
            for dy in range(k):
                tap = sxd[dy * dilation:dy * dilation + bh]
                term = tap * wv[dy * k + dx]
                acc = term if acc is None else acc + term
        out_ref[0] = acc.astype(out_ref.dtype)

    pl.run_scoped(
        body,
        scratch=pltpu.VMEM((win_rows, wp, c), x_hbm.dtype),
        sem=pltpu.SemaphoreType.DMA(()),
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def depthwise_conv2d(x, w, k: int = 5, dilation: int = 1):
    """Depthwise 2-D conv, SAME padding, stride 1.

    Args:
      x: [N, H, W, C]; w: [K, K, C] per-channel kernel.

    Returns [N, H, W, C].
    """
    return _dw_forward(x, w, k, dilation)


def _dw_forward(x, w, k, dilation):
    n, h, width, c = x.shape
    # Mosaic requires the lane (channel) dim of DMA'd slices to align
    # to 128 — pad channels and strip after
    cpad = (-c) % 128
    if cpad:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, cpad)))
        w = jnp.pad(w, ((0, 0), (0, 0), (0, cpad)))
    out = _dw_forward_aligned(x, w, k, dilation)
    return out[..., :c] if cpad else out


def _dw_forward_aligned(x, w, k, dilation):
    n, h, width, c = x.shape
    p = dilation * (k - 1) // 2
    bh = min(16, h)
    hpad = (-h) % bh
    # bf16 HBM->VMEM DMAs require the second-minor (W) dim of the
    # copied window to be 16-aligned (f32: 8) — pad W and ignore the
    # tail in the kernel's tap slices
    wpad = (-(width + 2 * p)) % 16
    xp = jnp.pad(x, ((0, 0), (p, p + hpad), (p, p + wpad), (0, 0)))
    grid = (n, (h + hpad) // bh)
    wf = w.reshape(k * k, c).astype(x.dtype)

    out = pl.pallas_call(
        functools.partial(_dw_kernel, k=k, dilation=dilation, bh=bh,
                          halo=p),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((k * k, c), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bh, width, c),
                               lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, h + hpad, width, c),
                                       x.dtype),
        interpret=jax.default_backend() == "cpu",
    )(xp, wf)
    return out[:, :h]


def _dw_fwd(x, w, k, dilation):
    return _dw_forward(x, w, k, dilation), (x, w)


def _dw_bwd(k, dilation, residuals, g):
    x, w = residuals
    c = x.shape[-1]
    w_flip = w[::-1, ::-1]
    hwio = w_flip.reshape(k, k, 1, c)
    pad = dilation * (k - 1) // 2
    dx = jax.lax.conv_general_dilated(
        g, hwio, (1, 1), [(pad, pad), (pad, pad)],
        rhs_dilation=(dilation, dilation), feature_group_count=c,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    xp = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
    h, width = x.shape[1], x.shape[2]
    taps = []
    for dy in range(k):
        row = []
        for dxx in range(k):
            tap = xp[:, dy * dilation:dy * dilation + h,
                     dxx * dilation:dxx * dilation + width]
            row.append((tap * g).sum(axis=(0, 1, 2)))
        taps.append(jnp.stack(row))
    dw = jnp.stack(taps)
    return dx, dw


depthwise_conv2d.defvjp(_dw_fwd, _dw_bwd)
