"""Depthwise conv with a layout-friendly custom backward (opt-in).

XLA's grouped-convolution *gradient* lowering materializes
batch-group-count convolutions whose operands need
[N, H, K, C]-shaped transposes — the round-2 train-step trace shows
~50 ms/iter of such layout copies around the VAN depthwise convs
(docs/perf_notes.md "Remaining"). The forward grouped conv itself is
fine; only the autodiff path pays.

This module keeps the forward exactly as XLA's grouped conv and
replaces the backward with layout-preserving NHWC formulations:

* input grad: one grouped conv of the cotangent with the spatially
  flipped kernel (same dilation/padding) — XLA lowers this like the
  forward, no batch-group-count path;
* weight grad: a static K*K-tap loop — ``dw[ky,kx,c] =
  sum_nhw xpad[n, h+ky*d, w+kx*d, c] * g[n,h,w,c]`` — each tap is a
  shifted elementwise multiply-reduce that XLA fuses into one NHWC
  pass (f32 accumulation, matching conv precision).

Scope: stride 1, symmetric SAME padding ``p = d*(k-1)//2`` — the only
depthwise shapes in VAN (dw3, dw5, dw7 dilation 3; reference
``python/jdet/models/backbones/van.py:179-213``). Enabled in the
training graph via ``RS_DW_TAP_BWD=1`` (A/B measured on TPU before
flipping the default; see docs/perf_notes.md round-3 log).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp


def tap_bwd_enabled() -> bool:
    return os.environ.get("RS_DW_TAP_BWD", "0") == "1"


def wgrad_pallas_enabled() -> bool:
    """Use the VMEM-resident Pallas weight-grad kernel
    (ops/pallas_dw_wgrad.py) instead of the jnp tap loop inside the
    custom backward. Default ON: the jnp loop re-reads x and g from
    HBM per tap (the round-3 693 ms/iter loser); the kernel reads each
    block once."""
    return os.environ.get("RS_DW_WGRAD_PALLAS", "1") == "1"


def _fwd_conv(x, w, dilation: int):
    k = w.shape[0]
    c = x.shape[-1]
    p = dilation * (k - 1) // 2
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), [(p, p), (p, p)],
        rhs_dilation=(dilation, dilation), feature_group_count=c,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def dw_conv(x, w, dilation: int = 1):
    """NHWC depthwise conv, ``w`` [K, K, 1, C], stride 1, SAME
    symmetric padding. No bias (add it at the call site)."""
    return _fwd_conv(x, w, dilation)


def _vjp_fwd(x, w, dilation: int):
    return _fwd_conv(x, w, dilation), (x, w)


def _vjp_bwd(dilation: int, res, g):
    x, w = res
    k = w.shape[0]
    c = x.shape[-1]
    p = dilation * (k - 1) // 2

    # d/dx: grouped conv with the 180deg-rotated kernel. For stride 1
    # and symmetric padding p the adjoint of the forward conv is the
    # correlation of g with the flipped taps at the same padding.
    dx = jax.lax.conv_general_dilated(
        g, jnp.flip(w, axis=(0, 1)), (1, 1), [(p, p), (p, p)],
        rhs_dilation=(dilation, dilation), feature_group_count=c,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=g.dtype).astype(x.dtype)

    if wgrad_pallas_enabled():
        # VMEM-resident Pallas tap-reduce: reads each (x, g) block
        # from HBM once and runs all K*K taps in VMEM (bf16 VPU
        # multiply + MXU f32 reduction per tap)
        from .pallas_dw_wgrad import dw_wgrad_pallas

        dw = dw_wgrad_pallas(x, g.astype(x.dtype), k, dilation) \
            .astype(w.dtype)
        return dx, dw

    # d/dw: static tap loop over the K*K offsets. Each tap reads a
    # shifted HxW view of the padded input against g — fused by XLA
    # into one elementwise+reduce pass per tap, no layout copies.
    xp = jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)))
    n, h, wdt, _ = x.shape
    taps = []
    for ky in range(k):
        for kx in range(k):
            sl = jax.lax.slice(
                xp, (0, ky * dilation, kx * dilation, 0),
                (n, ky * dilation + h, kx * dilation + wdt, c))
            taps.append(jnp.sum(sl * g, axis=(0, 1, 2),
                                dtype=jnp.float32))
    dw = jnp.stack(taps).reshape(k, k, 1, c).astype(w.dtype)
    return dx, dw


dw_conv.defvjp(_vjp_fwd, _vjp_bwd)
