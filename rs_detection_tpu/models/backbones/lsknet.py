"""LSKNet backbone (flax.linen, NHWC).

Capability parity with the reference LSKNet
(``python/jdet/models/backbones/lsknet.py:278-426``): large selective
kernel attention — two depthwise branches (5x5 and 7x7-dilated-3),
spatial attention over their avg/max pooled concat, selective fusion —
inside VAN-style blocks (BN, conv-MLP, layer scale).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ...utils.registry import BACKBONES
from ..utils.modules import DropPath, Norm, kaiming_normal_fanout, exact_gelu
from .van import Mlp, OverlapPatchEmbed, _dwconv


class LSKModule(nn.Module):
    """Large Selective Kernel unit (reference ``LSKblock``)."""

    dim: int

    @nn.compact
    def __call__(self, x):
        a1 = _dwconv(x, self.dim, 5, name="conv0")
        a2 = _dwconv(a1, self.dim, 7, dilation=3, name="conv_spatial")
        a1 = nn.Conv(self.dim // 2, (1, 1), dtype=x.dtype,
                     name="conv1")(a1)
        a2 = nn.Conv(self.dim // 2, (1, 1), dtype=x.dtype,
                     name="conv2")(a2)
        attn = jnp.concatenate([a1, a2], axis=-1)
        avg = attn.mean(axis=-1, keepdims=True)
        mx = attn.max(axis=-1, keepdims=True)
        agg = jnp.concatenate([avg, mx], axis=-1)
        sig = nn.sigmoid(nn.Conv(2, (7, 7), padding=3, dtype=x.dtype,
                                 name="conv_squeeze")(agg))
        fused = a1 * sig[..., 0:1] + a2 * sig[..., 1:2]
        fused = nn.Conv(self.dim, (1, 1), dtype=x.dtype,
                        name="conv")(fused)
        return x * fused


class LSKAttention(nn.Module):
    dim: int

    @nn.compact
    def __call__(self, x):
        shortcut = x
        x = nn.Conv(self.dim, (1, 1), dtype=x.dtype, name="proj_1")(x)
        x = exact_gelu(x)
        x = LSKModule(self.dim, name="spatial_gating_unit")(x)
        x = nn.Conv(self.dim, (1, 1), dtype=x.dtype, name="proj_2")(x)
        return x + shortcut


class LSKBlock(nn.Module):
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
        h = LSKAttention(self.dim, name="attn")(h)
        x = x + DropPath(self.drop_path)(ls1.astype(h.dtype) * h,
                                         deterministic=not train)
        h = Norm("bn", name="norm2")(x, train)
        h = Mlp(int(self.dim * self.mlp_ratio), self.dim, name="mlp")(h)
        x = x + DropPath(self.drop_path)(ls2.astype(h.dtype) * h,
                                         deterministic=not train)
        return x


class LSKNet(nn.Module):
    embed_dims: Sequence[int] = (64, 128, 320, 512)
    mlp_ratios: Sequence[float] = (8, 8, 4, 4)
    depths: Sequence[int] = (2, 2, 4, 2)
    drop_path_rate: float = 0.0
    out_indices: Sequence[int] = (0, 1, 2, 3)

    @nn.compact
    def __call__(self, x, train: bool = False) -> Tuple[jnp.ndarray, ...]:
        dpr = np.linspace(0, self.drop_path_rate, sum(self.depths))
        cur = 0
        outs = []
        for i, (dim, depth) in enumerate(zip(self.embed_dims,
                                             self.depths)):
            x = OverlapPatchEmbed(dim, patch=7 if i == 0 else 3,
                                  stride=4 if i == 0 else 2,
                                  name=f"patch_embed{i+1}")(x, train)
            for j in range(depth):
                x = LSKBlock(dim, self.mlp_ratios[i], float(dpr[cur + j]),
                             name=f"block{i+1}_{j}")(x, train)
            cur += depth
            x = nn.LayerNorm(epsilon=1e-6, dtype=x.dtype,
                             name=f"norm{i+1}")(x)
            if i in self.out_indices:
                outs.append(x)
        return tuple(outs)


def _lsknet_t(pretrained=False, **kw):
    return LSKNet(embed_dims=(32, 64, 160, 256), depths=(3, 3, 5, 2),
                  **kw)


def _lsknet_s(pretrained=False, **kw):
    return LSKNet(embed_dims=(64, 128, 320, 512), depths=(2, 2, 4, 2),
                  **kw)


BACKBONES.register_module(name="lsknet_t", module=_lsknet_t)
BACKBONES.register_module(name="lsknet_s", module=_lsknet_s)
BACKBONES.register_module(name="LSKNet", module=LSKNet)
