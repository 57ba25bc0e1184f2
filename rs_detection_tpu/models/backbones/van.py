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

from ...ops.pallas_van_mlp import _ref_mlp, van_mlp
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


class LKA(nn.Module):
    """Large-kernel attention (reference ``AttentionModule`` :179-196)."""

    dim: int

    @nn.compact
    def __call__(self, x):
        u = x
        attn = _dwconv(x, self.dim, 5, name="conv0")
        attn = _dwconv(attn, self.dim, 7, dilation=3, name="conv_spatial")
        attn = nn.Conv(self.dim, (1, 1), dtype=x.dtype,
                       kernel_init=kaiming_normal_fanout(),
                       name="conv1")(attn)
        return u * attn


class SpatialAttention(nn.Module):
    dim: int

    @nn.compact
    def __call__(self, x):
        shortcut = x
        x = nn.Conv(self.dim, (1, 1), dtype=x.dtype,
                    kernel_init=kaiming_normal_fanout(), name="proj_1")(x)
        # exact (erf) gelu: jittor/torch nn.GELU semantics, not the
        # tanh approximation — parity-relevant for converted weights
        x = exact_gelu(x)
        x = LKA(self.dim, name="sgu")(x)
        x = nn.Conv(self.dim, (1, 1), dtype=x.dtype,
                    kernel_init=kaiming_normal_fanout(), name="proj_2")(x)
        return x + shortcut


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
    def __call__(self, x, train: bool = False):
        c = x.shape[-1]
        w1, b1 = _ConvParams((1, 1, c, self.hidden),
                             kaiming_normal_fanout(), name="fc1")()
        wdw, bdw = _ConvParams((3, 3, 1, self.hidden),
                               kaiming_normal_fanout(), name="dwconv")()
        w2, b2 = _ConvParams((1, 1, self.hidden, self.out),
                             kaiming_normal_fanout(), name="fc2")()
        dt = x.dtype
        args = (x, w1.reshape(c, self.hidden).astype(dt),
                b1.astype(dt), wdw.reshape(9, self.hidden).astype(dt),
                bdw.astype(dt), w2.reshape(self.hidden, self.out)
                .astype(dt), b2.astype(dt))
        # measured (batch 8, bf16, erf gelu): the kernel beats XLA
        # stage-stacked at every stage (25.1->19.5 / 20.8->13.8 /
        # 36.2->26.6 ms for stages 1/2/3) — default ON for TPU
        # inference, RS_VAN_MLP_PALLAS=0 disables
        if (jax.default_backend() == "tpu" and not train
                and os.environ.get("RS_VAN_MLP_PALLAS", "1") != "0"):
            return van_mlp(*args)
        return _ref_mlp(*args)


class VANBlock(nn.Module):
    dim: int
    mlp_ratio: float = 4.0
    drop_path: float = 0.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        ls1 = self.param("layer_scale_1",
                         nn.initializers.constant(1e-2), (self.dim,))
        ls2 = self.param("layer_scale_2",
                         nn.initializers.constant(1e-2), (self.dim,))
        h = Norm("bn", name="norm1")(x, train)
        h = SpatialAttention(self.dim, name="attn")(h)
        x = x + DropPath(self.drop_path)(ls1.astype(h.dtype) * h,
                                         deterministic=not train)
        h = Norm("bn", name="norm2")(x, train)
        h = Mlp(int(self.dim * self.mlp_ratio), self.dim,
                name="mlp")(h, train)
        x = x + DropPath(self.drop_path)(ls2.astype(h.dtype) * h,
                                         deterministic=not train)
        return x


class OverlapPatchEmbed(nn.Module):
    dim: int
    patch: int = 7
    stride: int = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.dim, (self.patch, self.patch),
                    (self.stride, self.stride), padding=self.patch // 2,
                    kernel_init=kaiming_normal_fanout(), dtype=x.dtype,
                    name="proj")(x)
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
