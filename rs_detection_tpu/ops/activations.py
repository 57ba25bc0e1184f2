"""Activation functions with exact torch/jittor semantics in
TPU-friendly forms (usable both in XLA graphs and inside Pallas
kernels — no erf/erfc primitives)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _erf_as(z):
    """Abramowitz–Stegun 7.1.26 erf polynomial (f32 in, f32 out; max
    abs err 1.5e-7 — below bf16 resolution)."""
    sgn = jnp.sign(z)
    za = jnp.abs(z)
    t = 1.0 / (1.0 + np.float32(0.3275911) * za)
    poly = t * (np.float32(0.254829592) + t * (
        np.float32(-0.284496736) + t * (np.float32(1.421413741) + t * (
            np.float32(-1.453152027) + t * np.float32(1.061405429)))))
    return sgn * (1.0 - poly * jnp.exp(-za * za))


@jax.custom_jvp
def exact_gelu(x):
    """Exact (erf) GELU via the Abramowitz–Stegun 7.1.26 erf polynomial.

    Numerically exact for bf16/f32 activations (max abs err 7.2e-7 vs
    the true erf form — below bf16 resolution) and measured ~40% faster
    on TPU than jax.nn.gelu(approximate=False), whose erfc formulation
    lowers expensively (5.87 vs 3.65 ms on a [8,256,256,512] bf16
    tensor; tanh-approx is 2.31 ms but 5e-4 off torch/jittor
    semantics).

    The custom JVP keeps the cotangent in the INPUT dtype: without it,
    autodiff through the internal f32 upcast makes every gelu gradient
    (and the remat recompute feeding it) an f32 tensor — at VAN-b3
    training shapes that is a [B, 256, 256, 512] f32 round-trip per
    stage-1 block.
    """
    f32 = jnp.float32
    h = x.astype(f32)
    erf = _erf_as(h * np.float32(0.7071067811865476))
    return (h * 0.5 * (1.0 + erf)).astype(x.dtype)


@exact_gelu.defjvp
def _exact_gelu_jvp(primals, tangents):
    (x,), (dx,) = primals, tangents
    f32 = jnp.float32
    h = x.astype(f32)
    erf = _erf_as(h * np.float32(0.7071067811865476))
    y = (h * 0.5 * (1.0 + erf)).astype(x.dtype)
    # gelu'(x) = Phi(x) + x * phi(x)
    phi = jnp.exp(np.float32(-0.5) * h * h) \
        * np.float32(0.3989422804014327)
    d = (0.5 * (1.0 + erf) + h * phi).astype(x.dtype)
    return y, d * dx
