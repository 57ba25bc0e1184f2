"""VAN (Visual Attention Network) backbone — the competition backbone.

Capability parity with the reference VAN
(``python/jdet/models/backbones/van.py:309-483``): overlap patch embeds,
LKA large-kernel attention (5x5 dw + 7x7 dw-dilated-3 + 1x1), layer
scale, conv-Mlp with depthwise 3x3, per-stage LayerNorm; variants
b0..b3 (b3 = VAN-Large, ``van_b3`` :471-483 — depths [3, 5, 27, 3]).

TPU-first: NHWC; LayerNorm over channels applied directly on the NHWC
tensor (equivalent to the reference's flatten->LN->reshape dance);
depthwise convs map to XLA's grouped convolutions.
"""

from __future__ import annotations

import os
from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ...ops.pallas_van_mlp import (_ref_mlp, van_mlp,
                                   van_mlp_residual)
from ...utils.registry import BACKBONES
from ..utils.modules import (DropPath, Norm, exact_gelu,
                             kaiming_normal_fanout)


def _dwconv(x, features, kernel, dilation=1, name=None):
    pad = dilation * (kernel - 1) // 2
    return nn.Conv(features, (kernel, kernel), padding=pad,
                   kernel_dilation=(dilation, dilation),
                   feature_group_count=features, use_bias=True,
                   kernel_init=kaiming_normal_fanout(), dtype=x.dtype,
                   name=name)(x)


class _LKAParams(nn.Module):
    """Parameter holder matching the LKA submodule tree
    (conv0 / conv_spatial / conv1 — reference ``AttentionModule``
    :179-196)."""

    dim: int

    @nn.compact
    def __call__(self):
        w0, b0 = _ConvParams((5, 5, 1, self.dim),
                             kaiming_normal_fanout(), name="conv0")()
        ws, bs = _ConvParams((7, 7, 1, self.dim),
                             kaiming_normal_fanout(),
                             name="conv_spatial")()
        w1, b1 = _ConvParams((1, 1, self.dim, self.dim),
                             kaiming_normal_fanout(), name="conv1")()
        return w0, b0, ws, bs, w1, b1


class SpatialAttention(nn.Module):
    """Parameter holder for the attention half-block; compute lives in
    ``ops.pallas_van_attn`` (``_sa_core`` XLA composition / ``van_attn``
    fused kernel) so both paths share one weight tree."""

    dim: int

    @nn.compact
    def __call__(self):
        d = self.dim
        wp1, bp1 = _ConvParams((1, 1, d, d), kaiming_normal_fanout(),
                               name="proj_1")()
        w0, b0, ws, bs, wc1, bc1 = _LKAParams(d, name="sgu")()
        wp2, bp2 = _ConvParams((1, 1, d, d), kaiming_normal_fanout(),
                               name="proj_2")()
        return (wp1.reshape(d, d), bp1, w0.reshape(25, d), b0,
                ws.reshape(49, d), bs, wc1.reshape(d, d), bc1,
                wp2.reshape(d, d), bp2)


class _BNAffine(nn.Module):
    """Declares the same variable tree as ``Norm('bn')``
    (<name>/BatchNorm_0/{scale,bias} + batch_stats {mean,var}) but
    returns the folded eval-mode affine (a, b) with y = a*x + b instead
    of applying it — lets fused kernels fold the norm into adjacent
    GEMMs while the checkpoint layout stays identical."""

    dim: int
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self):
        class _Inner(nn.Module):
            dim: int

            @nn.compact
            def __call__(self):
                scale = self.param("scale", nn.initializers.ones,
                                   (self.dim,))
                bias = self.param("bias", nn.initializers.zeros,
                                  (self.dim,))
                mean = self.variable(
                    "batch_stats", "mean",
                    lambda: jnp.zeros((self.dim,), jnp.float32))
                var = self.variable(
                    "batch_stats", "var",
                    lambda: jnp.ones((self.dim,), jnp.float32))
                return scale, bias, mean.value, var.value

        s, b, m, v = _Inner(self.dim, name="BatchNorm_0")()
        a = s / jnp.sqrt(v + self.epsilon)
        return a, b - m * a


class _ConvParams(nn.Module):
    """Parameter holder with nn.Conv-compatible tree (kernel, bias) —
    lets Mlp route compute through the fused Pallas kernel while the
    checkpoint layout stays byte-identical to the nn.Conv version."""

    kshape: Tuple[int, ...]
    kernel_init: Any

    @nn.compact
    def __call__(self):
        k = self.param("kernel", self.kernel_init, self.kshape)
        b = self.param("bias", nn.initializers.zeros,
                       (self.kshape[-1],))
        return k, b


class Mlp(nn.Module):
    """fc1 (1x1) -> dw 3x3 -> GELU -> fc2 (1x1). On TPU inference the
    whole MLP runs as one fused Pallas kernel (ops/pallas_van_mlp.py)
    keeping the 4x-hidden tensor in VMEM; training and other backends
    use the equivalent XLA composition (the kernel's vjp would fall
    back to it anyway)."""

    hidden: int
    out: int

    @nn.compact
    def __call__(self, x, train: bool = False, affine=None, ls=None):
        """Plain call: mlp(x) via XLA or the fused kernel.

        With ``affine=(a2, b2)`` and ``ls`` (fused block path), ``x``
        is the RAW block input: the bn2 affine folds into fc1, the
        layer scale into fc2, and the kernel returns
        ``x + ls * mlp(a2*x + b2)`` with the residual added in-VMEM."""
        c = x.shape[-1]
        w1, b1 = _ConvParams((1, 1, c, self.hidden),
                             kaiming_normal_fanout(), name="fc1")()
        wdw, bdw = _ConvParams((3, 3, 1, self.hidden),
                               kaiming_normal_fanout(), name="dwconv")()
        w2, b2 = _ConvParams((1, 1, self.hidden, self.out),
                             kaiming_normal_fanout(), name="fc2")()
        dt = x.dtype
        w1r = w1.reshape(c, self.hidden)
        w2r = w2.reshape(self.hidden, self.out)
        if affine is not None:
            a2, bv = affine
            w1f = a2[:, None] * w1r
            b1f = b1 + bv @ w1r
            w2f = w2r * ls[None, :]
            b2f = b2 * ls
            return van_mlp_residual(
                x, w1f.astype(dt), b1f.astype(dt),
                wdw.reshape(9, self.hidden).astype(dt), bdw.astype(dt),
                w2f.astype(dt), b2f.astype(dt))
        args = (x, w1r.astype(dt), b1.astype(dt),
                wdw.reshape(9, self.hidden).astype(dt),
                bdw.astype(dt), w2r.astype(dt), b2.astype(dt))
        # measured (batch 8, bf16, erf gelu): the kernel beats XLA
        # stage-stacked at every stage (25.1->19.5 / 20.8->13.8 /
        # 36.2->26.6 ms for stages 1/2/3) — default ON for TPU
        # inference, RS_VAN_MLP_PALLAS=0 disables
        if (jax.default_backend() == "tpu" and not train
                and os.environ.get("RS_VAN_MLP_PALLAS", "1") != "0"):
            return van_mlp(*args)
        from ...ops.quant import int8_enabled
        if int8_enabled(train):
            from ...ops.pallas_van_mlp import _int8_mlp
            return _int8_mlp(*args)
        return _ref_mlp(*args)


class VANBlock(nn.Module):
    dim: int
    mlp_ratio: float = 4.0
    drop_path: float = 0.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        from ...ops.pallas_van_attn import _sa_core, van_attn

        ls1 = self.param("layer_scale_1",
                         nn.initializers.constant(1e-2), (self.dim,))
        ls2 = self.param("layer_scale_2",
                         nn.initializers.constant(1e-2), (self.dim,))
        attn_w = SpatialAttention(self.dim, name="attn")()
        mlp = Mlp(int(self.dim * self.mlp_ratio), self.dim, name="mlp")

        # fused attn kernel measured SLOWER than XLA e2e (87 vs 13 ms
        # stage-1-stacked: the 11-halo overcompute + sublane-shift
        # relayouts outweigh the pass fusion — docs/perf_notes.md);
        # kept opt-in for future layout work. The MLP kernel (used via
        # the non-fused branch) stays default-on.
        fused = ((os.environ.get("RS_VAN_FUSED") == "1"
                  and jax.default_backend() == "tpu")
                 or os.environ.get("RS_VAN_FUSED_FORCE") == "1")             and not train
        if fused:
            # whole block as two VMEM-resident kernels: bn affines
            # folded in, layer scales + residuals in-kernel
            a1, b1 = _BNAffine(self.dim, name="norm1")()
            x = van_attn(x, a1, b1, *attn_w, ls1)
            a2, b2 = _BNAffine(self.dim, name="norm2")()
            return mlp(x, train, affine=(a2, b2), ls=ls2)

        h = Norm("bn", name="norm1")(x, train)
        h = _sa_core(h, *attn_w, train=train)
        x = x + DropPath(self.drop_path)(ls1.astype(h.dtype) * h,
                                         deterministic=not train)
        h = Norm("bn", name="norm2")(x, train)
        h = mlp(h, train)
        x = x + DropPath(self.drop_path)(ls2.astype(h.dtype) * h,
                                         deterministic=not train)
        return x


class OverlapPatchEmbed(nn.Module):
    dim: int
    patch: int = 7
    stride: int = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        from ...ops.quant import MaybeInt8Conv

        # stage-1's RGB stem stays bf16 (K=3); stages 2-4 are dense
        # 3x3/s2 convs that ride the int8 MXU path when serving int8
        x = MaybeInt8Conv(self.dim, (self.patch, self.patch),
                          (self.stride, self.stride),
                          padding=self.patch // 2,
                          kernel_init=kaiming_normal_fanout(),
                          dtype=x.dtype, name="proj")(x, train)
        return Norm("bn", name="norm")(x, train)


class VAN(nn.Module):
    embed_dims: Sequence[int] = (64, 128, 320, 512)
    mlp_ratios: Sequence[float] = (8, 8, 4, 4)
    depths: Sequence[int] = (3, 5, 27, 3)
    drop_path_rate: float = 0.0
    out_indices: Sequence[int] = (0, 1, 2, 3)
    # rematerialize each block in the backward pass: without this the
    # 38 blocks' saved activations (incl. 4x/8x-hidden MLP tensors) far
    # exceed HBM at 1024^2 training batches — remat trades ~1/3 extra
    # forward FLOPs for per-block activation memory
    remat: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False) -> Tuple[jnp.ndarray, ...]:
        dpr = np.linspace(0, self.drop_path_rate, sum(self.depths))
        cur = 0
        outs = []
        block_cls = (nn.remat(VANBlock, static_argnums=(2,))
                     if self.remat and train else VANBlock)
        for i, (dim, depth) in enumerate(zip(self.embed_dims, self.depths)):
            x = OverlapPatchEmbed(dim,
                                  patch=7 if i == 0 else 3,
                                  stride=4 if i == 0 else 2,
                                  name=f"patch_embed{i+1}")(x, train)
            for j in range(depth):
                x = block_cls(dim, self.mlp_ratios[i],
                              float(dpr[cur + j]),
                              name=f"block{i+1}_{j}")(x, train)
            cur += depth
            # per-stage LayerNorm over channels (token-LN equivalent)
            x = nn.LayerNorm(epsilon=1e-6, dtype=x.dtype,
                             name=f"norm{i+1}")(x)
            if i in self.out_indices:
                outs.append(x)
        return tuple(outs)


_VAN_ARCH = {
    "van_b0": dict(embed_dims=(32, 64, 160, 256), mlp_ratios=(8, 8, 4, 4),
                   depths=(3, 3, 5, 2)),
    "van_b1": dict(embed_dims=(64, 128, 320, 512), mlp_ratios=(8, 8, 4, 4),
                   depths=(2, 2, 4, 2)),
    "van_b2": dict(embed_dims=(64, 128, 320, 512), mlp_ratios=(8, 8, 4, 4),
                   depths=(3, 3, 12, 3)),
    "van_b3": dict(embed_dims=(64, 128, 320, 512), mlp_ratios=(8, 8, 4, 4),
                   depths=(3, 5, 27, 3)),
}


def _make_van(arch):
    @BACKBONES.register_module(name=arch)
    def ctor(pretrained=False, **kw):
        import dataclasses

        cfg = dict(_VAN_ARCH[arch])
        # keep only VAN dataclass fields: reference configs pass timm
        # surface kwargs (img_size, num_stages, num_classes, flag, ...)
        fields = {f.name for f in dataclasses.fields(VAN)}
        cfg.update({k: v for k, v in kw.items() if k in fields})
        return VAN(**cfg)
    return ctor


for _a in _VAN_ARCH:
    _make_van(_a)

BACKBONES.register_module(name="VAN", module=VAN)
