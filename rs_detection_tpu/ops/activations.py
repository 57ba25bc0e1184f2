"""Activation functions with exact torch/jittor semantics in
TPU-friendly forms (usable both in XLA graphs and inside Pallas
kernels — no erf/erfc primitives)."""

from __future__ import annotations


def exact_gelu(x):
    """Exact (erf) GELU via the Abramowitz–Stegun 7.1.26 erf polynomial.

    Numerically exact for bf16/f32 activations (max abs err 7.2e-7 vs
    the true erf form — below bf16 resolution) and measured ~40% faster
    on TPU than jax.nn.gelu(approximate=False), whose erfc formulation
    lowers expensively (5.87 vs 3.65 ms on a [8,256,256,512] bf16
    tensor; tanh-approx is 2.31 ms but 5e-4 off torch/jittor
    semantics)."""
    import jax.numpy as jnp
    import numpy as np

    f32 = jnp.float32
    h = x.astype(f32)
    z = h * np.float32(0.7071067811865476)
    sgn = jnp.sign(z)
    za = jnp.abs(z)
    t = 1.0 / (1.0 + np.float32(0.3275911) * za)
    poly = t * (np.float32(0.254829592) + t * (
        np.float32(-0.284496736) + t * (np.float32(1.421413741) + t * (
            np.float32(-1.453152027) + t * np.float32(1.061405429)))))
    erf = sgn * (1.0 - poly * jnp.exp(-za * za))
    return (h * 0.5 * (1.0 + erf)).astype(x.dtype)
