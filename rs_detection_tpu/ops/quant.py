"""int8 serving mode (opt-in, ``RS_INT8=1``).

The v5e MXU runs s8xs8->s32 at 2x the bf16 rate (394 vs 197 TOPS), so
the serving path can trade a little quantization VPU work for half the
MXU time on the dense GEMM-shaped ops. This module implements the
quantized compute used behind the flag:

* activations: dynamic symmetric per-tensor int8 (scale = max|x|/127,
  computed on the fly — no calibration pass; the max-reduce fuses
  into the producing op's epilogue);
* weights: symmetric per-output-channel int8;
* accumulation in int32, dequantize + bias in f32, output in the
  caller's dtype. Depthwise convs, box decode, NMS and losses stay in
  bf16/f32 — only dense (non-grouped) convs and channel-mixing
  einsums quantize (VERDICT round-2 #2 scope).

Applied at: VAN attention 1x1 projections (``ops/pallas_van_attn
._sa_core``), the XLA MLP path (``ops/pallas_van_mlp._ref_mlp``),
stage-2..4 patch-embed convs, FPN lateral/output convs and the RPN
3x3 tower conv (``MaybeInt8Conv`` keeps the nn.Conv parameter tree so
checkpoints are layout-identical).

Reference has no quantized path; this is a TPU-native serving
extension validated by the overfit-mAP harness
(``tests/test_int8_serving.py``).
"""

from __future__ import annotations

import os
from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


def int8_enabled(train: bool = False) -> bool:
    """Serving-only flag: RS_INT8=1 enables the quantized path."""
    return (not train) and os.environ.get("RS_INT8", "0") == "1"


def _qact(x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Dynamic symmetric per-tensor int8 quantization of activations.

    Returns ``(x_q int8, scale f32 scalar)`` with
    ``x ~= x_q * scale``. The zero tensor gets scale 1 (all-zero q).
    """
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf))
    scale = jnp.where(amax > 0, amax / 127.0, 1.0)
    q = jnp.clip(jnp.round(xf / scale), -127, 127).astype(jnp.int8)
    return q, scale


def _qweight(w: jnp.ndarray, axis: int = -1):
    """Symmetric per-output-channel int8 weights: ``w ~= w_q * s_w``
    with ``s_w`` broadcast along ``axis``."""
    wf = w.astype(jnp.float32)
    red = tuple(i for i in range(wf.ndim) if i != axis % wf.ndim)
    amax = jnp.max(jnp.abs(wf), axis=red, keepdims=True)
    s = jnp.where(amax > 0, amax / 127.0, 1.0)
    q = jnp.clip(jnp.round(wf / s), -127, 127).astype(jnp.int8)
    return q, s.reshape(-1)


def int8_channel_matmul(x: jnp.ndarray, w: jnp.ndarray,
                        b: jnp.ndarray | None = None) -> jnp.ndarray:
    """``einsum('...c,cd->...d')`` with int8 inputs on the MXU.

    ``x``: any leading shape with channel minor; ``w``: [C, D].
    """
    dt = x.dtype
    xq, sx = _qact(x)
    wq, sw = _qweight(w, axis=-1)
    acc = jax.lax.dot_general(
        xq.reshape(-1, xq.shape[-1]), wq,
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * (sx * sw)[None, :]
    if b is not None:
        y = y + b.astype(jnp.float32)
    return y.reshape(*x.shape[:-1], w.shape[-1]).astype(dt)


def int8_conv(x: jnp.ndarray, w: jnp.ndarray,
              b: jnp.ndarray | None = None, *,
              strides: Sequence[int] = (1, 1),
              padding: Any = "SAME") -> jnp.ndarray:
    """Dense NHWC/HWIO conv with int8 inputs, int32 accumulation."""
    dt = x.dtype
    xq, sx = _qact(x)
    wq, sw = _qweight(w, axis=-1)
    acc = jax.lax.conv_general_dilated(
        xq, wq, tuple(strides), padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * (sx * sw)
    if b is not None:
        y = y + b.astype(jnp.float32)
    return y.astype(dt)


class MaybeInt8Conv(nn.Module):
    """Drop-in for ``nn.Conv`` (same parameter tree: ``kernel`` HWIO +
    ``bias``) that routes through ``int8_conv`` when serving int8 is
    enabled, and through the normal conv otherwise. Dense convs only
    (no feature groups)."""

    features: int
    kernel_size: Tuple[int, int]
    strides: Tuple[int, int] = (1, 1)
    padding: Any = "SAME"
    use_bias: bool = True
    dtype: Any = None
    kernel_init: Any = nn.initializers.lecun_normal()
    bias_init: Any = nn.initializers.zeros

    @nn.compact
    def __call__(self, x, train: bool = False):
        kh, kw = self.kernel_size
        k = self.param("kernel", self.kernel_init,
                       (kh, kw, x.shape[-1], self.features))
        b = self.param("bias", self.bias_init, (self.features,)) \
            if self.use_bias else None
        pad = self.padding
        if isinstance(pad, int):
            pad = [(pad, pad), (pad, pad)]
        # K<16 convs (e.g. a stem over RGB) waste the MXU's int8 mode
        # and carry the worst relative quantization error — stay bf16
        if int8_enabled(train) and x.shape[-1] >= 16:
            return int8_conv(x, k, b, strides=self.strides, padding=pad)
        dt = self.dtype or x.dtype
        y = jax.lax.conv_general_dilated(
            x, k.astype(dt), tuple(self.strides), pad,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=dt)
        if b is not None:
            y = y + b.astype(dt)
        return y
