"""VMEM-resident depthwise-conv weight gradient.

``dw[ky, kx, c] = sum_{n,y,x} xpad[n, y + ky*d, x + kx*d, c] *
g[n, y, x, c]`` — the grouped-conv weight gradient that XLA lowers
through batch-group-count convolutions with [N, H, K, C]-shaped layout
copies (~50 ms/iter in the VAN-b3 train step, docs/perf_notes.md), and
that the round-3 jnp tap loop lost on because it re-read x and g from
HBM once per tap (25/49/9 taps -> tens of GB; 693 vs 586 ms/iter).

This kernel reads each (x, g) row block from HBM ONCE and runs all
K*K taps against the VMEM-resident copies:

* the tap multiply is a bf16 VPU op (matching the conv's own operand
  precision), followed by an f32 VPU (rows * cols) reduction — an MXU
  ``ones @ prod`` reduce was tried first and measured slower e2e (the
  M=1 matmul uses 1/128 of the systolic rows per tap, latency-bound);
* per-tap partials accumulate in an f32 VMEM scratch that persists
  across the sequential grid (one accumulator update per block); the
  last program writes the [K*K, C] result.

x blocks overlap by the 2p halo, which BlockSpec pipelining cannot
express — x stays in ANY memory and is double-buffer DMA'd manually
(same pattern as ops/pallas_van_mlp.py); g blocks are disjoint and use
a plain pipelined BlockSpec.

Scope matches ``ops/dw_conv.py``: stride 1, symmetric SAME padding
``p = d*(k-1)//2`` (VAN's dw3 / dw5 / dw7-dilation-3; reference
``python/jdet/models/backbones/van.py:179-243``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _wgrad_kernel(xp_hbm, g_ref, out_ref, xbuf, acc_ref, sems, *,
                  k: int, d: int, bh: int, wgp: int, rows: int):
    n_i = pl.program_id(0)
    j = pl.program_id(1)
    nj = pl.num_programs(1)
    first = (n_i == 0) & (j == 0)
    last = (n_i + 1 == pl.num_programs(0)) & (j + 1 == nj)

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
    # block restarts the pipeline — a cross-image prefetch would
    # double-issue into the slot the next program's j==0 also fills)
    @pl.when(j + 1 < nj)
    def _():
        dma(n_i, j + 1, nslot).start()

    dma(n_i, j, slot).wait()

    @pl.when(first)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    xv = xbuf[slot]                                   # [rows, Wp, C]
    gv = g_ref[0]                                     # [bh, Wgp, C]
    parts = [None] * (k * k)
    for dx in range(k):
        sxd = xv[:, dx * d:dx * d + wgp]              # one relayout/dx
        for dy in range(k):
            prod = sxd[dy * d:dy * d + bh] * gv       # bf16 VPU mul
            # VPU f32 reduce. (An MXU ones@prod reduce was tried
            # first and measured 666 vs 533 ms/iter e2e train — the
            # M=1 matmul uses 1/128 of the systolic rows per tap and
            # is latency-bound.)
            parts[dy * k + dx] = jnp.sum(prod, axis=(0, 1),
                                         dtype=jnp.float32)
    # one accumulator update per block, not one per tap
    acc_ref[...] += jnp.stack(parts)

    @pl.when(last)
    def _():
        out_ref[...] = acc_ref[...]


@functools.partial(jax.jit, static_argnames=("k", "dilation"))
def dw_wgrad_pallas(x, g, k: int, dilation: int = 1):
    """Depthwise weight grad: x [N, H, W, C], g [N, H, W, C] ->
    [k, k, 1, C] f32. Stride 1, SAME symmetric padding."""
    n, h, w, c = x.shape
    d = dilation
    p = d * (k - 1) // 2
    cpad = (-c) % 128
    wgp = w + (-w) % 16
    wp_need = (k - 1) * d + wgp
    wp = wp_need + (-wp_need) % 16
    # bh=32 overflowed the 100M scoped-vmem budget by 0.5M at the
    # stage-1 hidden shape [8,256,256,512] (two x slots + pipelined g
    # + tap temporaries); 16 leaves ~2x headroom
    bh = min(16, h)
    hpad = (-h) % bh
    nj = (h + hpad) // bh
    rows = bh + 2 * p

    # zero padding everywhere: padded g rows/cols are zero so their
    # taps contribute nothing; padded x cols pair only with zero g
    xp = jnp.pad(x, ((0, 0), (p, p + hpad), (p, wp - w - p),
                     (0, cpad)))
    gp = jnp.pad(g, ((0, 0), (0, hpad), (0, wgp - w), (0, cpad)))

    out = pl.pallas_call(
        functools.partial(_wgrad_kernel, k=k, d=d, bh=bh, wgp=wgp,
                          rows=rows),
        grid=(n, nj),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, bh, wgp, c + cpad),
                         lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((k * k, c + cpad), lambda i, j: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((k * k, c + cpad), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, rows, wp, c + cpad), x.dtype),
            pltpu.VMEM((k * k, c + cpad), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=jax.default_backend() == "cpu",
    )(xp, gp)
    return out[:, :c].reshape(k, k, 1, c)
