"""Prototype: depthwise conv with CHW layout (rows leading, C sublanes,
W lanes) — dw taps as lane rotates + free leading-dim row slices.
Measured against XLA's grouped conv at VAN stage-1 shapes. Measured
NEGATIVE (docs/perf_notes.md): parity with XLA, both VPU
instruction-bound — kept as the reference for the Mosaic facts it
established (static-shift jnp.roll, manual halo DMA, vmem_limit).

Run on TPU: python tools/analysis_tools/chw_dw_proto.py
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _dw_kernel(x_hbm, w_ref, o_ref, xbuf, sems, *, bh, c, w,
               img_h, k, dil):
    # x_hbm: full padded [N, Hp, C, W] in ANY (overlapping haloed row
    # blocks can't be BlockSpec'd — manual double-buffered DMA);
    # w_ref: [C, k*k]; o_ref: [bh, C, W]
    halo = (k // 2) * dil
    n_i = pl.program_id(0)
    j = pl.program_id(1)
    nj = pl.num_programs(1)
    rows = bh + 2 * halo
    f32 = jnp.float32

    def dma(prog_n, prog_j, slot):
        return pltpu.make_async_copy(
            x_hbm.at[prog_n, pl.ds(prog_j * bh, rows)],
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
    x_ref = xbuf[slot][None]

    # hoist the dx rotations: one masked rotate per dx serves all dy
    col = jax.lax.broadcasted_iota(jnp.int32, (1, w), 1)
    rot = {}
    for tx in range(k):
        dx = (tx - k // 2) * dil
        if dx == 0:
            rot[dx] = None
            continue
        # out[x] needs in[x + dx]; valid iff 0 <= x + dx < w
        rot[dx] = (col + dx >= 0) & (col + dx < w)

    for r in range(bh):
        acc = None
        for ty in range(k):
            dy = (ty - k // 2) * dil
            row = x_ref[0, r + halo + dy]           # [C, W]
            for tx in range(k):
                dx = (tx - k // 2) * dil
                wt = w_ref[:, ty * k + tx][:, None].astype(f32)
                if dx == 0:
                    v = row.astype(f32)
                else:
                    v = jnp.roll(row, -dx, axis=1).astype(f32)
                    v = jnp.where(rot[dx], v, 0.0)
                t = v * wt
                acc = t if acc is None else acc + t
        o_ref[0, r] = acc.astype(o_ref.dtype)


def dw_chw(x, wts, k, dil, bh=16, interpret=False):
    """x: [N, H, C, W]; wts: [C, k*k] -> [N, H, C, W]."""
    n, h, c, w = x.shape
    halo = (k // 2) * dil
    xp = jnp.pad(x, ((0, 0), (halo, halo + (-h) % bh), (0, 0), (0, 0)))
    grid = (n, (h + (-h) % bh) // bh)
    rows = bh + 2 * halo
    return pl.pallas_call(
        functools.partial(_dw_kernel, bh=bh, c=c, w=w, img_h=h, k=k,
                          dil=dil),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((c, k * k), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bh, c, w), lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, (h + (-h) % bh), c, w),
                                       x.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, rows, c, w), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(xp, wts)[:, :h]


def dw_xla_nhwc(x_nhwc, wts, k, dil):
    c = x_nhwc.shape[-1]
    pad = (k // 2) * dil
    return jax.lax.conv_general_dilated(
        x_nhwc, wts.T.reshape(k, k, 1, c).astype(x_nhwc.dtype),
        (1, 1), [(pad, pad), (pad, pad)], rhs_dilation=(dil, dil),
        feature_group_count=c,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=x_nhwc.dtype)


def main():
    n, h, w, c = 8, 256, 256, 64
    dt = jnp.bfloat16
    rng = np.random.RandomState(0)
    x_nhwc = jnp.asarray(rng.randn(n, h, w, c), dt)
    x_chw = jnp.transpose(x_nhwc, (0, 1, 3, 2))   # [N, H, C, W]

    on_tpu = jax.default_backend() == "tpu"
    for (k, dil, name) in [(5, 1, "dw5"), (7, 3, "dw7d3")]:
        wts = jnp.asarray(rng.randn(c, k * k) * 0.1, dt)

        # correctness (interpret on cpu / real on tpu)
        y_chw = dw_chw(x_chw, wts, k, dil, interpret=not on_tpu)
        y_ref = dw_xla_nhwc(x_nhwc, wts, k, dil)
        d = np.abs(np.asarray(jnp.transpose(y_chw, (0, 1, 3, 2)),
                              np.float32) - np.asarray(y_ref, np.float32))
        print(f"{name}: max diff {d.max():.5f}", flush=True)

        if on_tpu:
            def timed(f, *a):
                g = jax.jit(lambda *aa: jnp.sum(f(*aa).astype(jnp.float32)))
                float(g(*a))
                t0 = time.perf_counter()
                y = None
                for _ in range(10):
                    y = g(*a)
                float(y)
                return (time.perf_counter() - t0) / 10 * 1e3

            t_chw = timed(lambda xx: dw_chw(xx, wts, k, dil), x_chw)
            t_xla = timed(lambda xx: dw_xla_nhwc(xx, wts, k, dil), x_nhwc)
            print(f"{name}: chw {t_chw:.2f} ms   xla {t_xla:.2f} ms",
                  flush=True)


if __name__ == "__main__":
    main()
