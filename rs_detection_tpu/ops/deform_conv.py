"""Deformable convolution (v1 / v2) as bilinear-gather + MXU matmul.

Capability parity with the reference inline-CUDA DCN
(``python/jdet/ops/dcn_v1.py`` — used by S2ANet's AlignConv — and
``dcn_v2.py`` for the modulated variant).

TPU-first design: instead of translating ``deformable_im2col``, the op
samples all K*K deformed taps with the shared bilinear gather
(``sampling.bilinear_sample``) into an [N, Ho, Wo, K*K*C] tensor and
contracts it with the [K*K*C, Cout] weight on the MXU — XLA fuses the
elementwise weighting; gradients (input, offset, weight, mask) all come
from autodiff of the gather + matmul, replacing the reference's four
hand-written backward kernels.

Offset layout matches the reference/torchvision: channels are
``[dg, K*K, 2]`` with (dy, dx) pairs per kernel tap.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .sampling import bilinear_sample_zeros


@functools.partial(
    jax.jit,
    static_argnames=("kernel_size", "stride", "padding", "dilation",
                     "deform_groups"))
def deform_conv2d(x, offset, weight, bias=None, mask=None,
                  kernel_size: int = 3, stride: int = 1, padding: int = 1,
                  dilation: int = 1, deform_groups: int = 1):
    """Deformable conv (v1 when ``mask is None``, v2 otherwise).

    Args:
      x: [N, H, W, C] input.
      offset: [N, Ho, Wo, 2 * dg * K * K] sampling offsets (dy, dx).
      weight: [K, K, C, Cout] (HWIO).
      mask: optional [N, Ho, Wo, dg * K * K] modulation (v2).

    Returns:
      [N, Ho, Wo, Cout].
    """
    k = kernel_size
    n, h, w, c = x.shape
    ho = (h + 2 * padding - dilation * (k - 1) - 1) // stride + 1
    wo = (w + 2 * padding - dilation * (k - 1) - 1) // stride + 1
    dg = deform_groups
    assert c % dg == 0

    off = offset.reshape(n, ho, wo, dg, k * k, 2)
    base_y = (jnp.arange(ho, dtype=jnp.float32) * stride - padding)
    base_x = (jnp.arange(wo, dtype=jnp.float32) * stride - padding)
    ky = jnp.repeat(jnp.arange(k, dtype=jnp.float32), k) * dilation
    kx = jnp.tile(jnp.arange(k, dtype=jnp.float32), k) * dilation

    # sample positions: [Ho, Wo, K*K]
    py = base_y[:, None, None] + ky[None, None, :]
    px = base_x[None, :, None] + kx[None, None, :]

    def sample_image(img, off_img, mask_img):
        # img [H, W, C]; off_img [Ho, Wo, dg, K*K, 2]
        cols = []
        cg = c // dg
        for g in range(dg):
            y = py + off_img[..., g, :, 0]
            xpos = px + off_img[..., g, :, 1]
            vals = bilinear_sample_zeros(img[..., g * cg:(g + 1) * cg], y, xpos)
            if mask_img is not None:
                vals = vals * mask_img[..., g, :, None]
            cols.append(vals)                       # [Ho, Wo, K*K, cg]
        return jnp.concatenate(cols, axis=-1)       # [Ho, Wo, K*K, C]

    if mask is not None:
        m = mask.reshape(n, ho, wo, dg, k * k)
        cols = jax.vmap(sample_image)(x, off, m)
    else:
        cols = jax.vmap(lambda i, o: sample_image(i, o, None))(x, off)

    # contract K*K taps x C channels against the kernel on the MXU
    wmat = weight.reshape(k * k * c, -1)             # [(K*K)*C, Cout]
    cols = cols.reshape(n, ho, wo, k * k * c)
    out = jnp.dot(cols, wmat, preferred_element_type=jnp.float32)
    if bias is not None:
        out = out + bias
    return out.astype(x.dtype)


def dcn_offset_grid(k: int):
    """Static (ky, kx) tap offsets used by AlignConv's offset builder."""
    ky = jnp.repeat(jnp.arange(k, dtype=jnp.float32), k)
    kx = jnp.tile(jnp.arange(k, dtype=jnp.float32), k)
    return ky, kx
