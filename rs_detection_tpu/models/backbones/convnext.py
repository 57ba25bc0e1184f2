"""ConvNeXt backbone family (flax.linen, NHWC).

Capability parity with the reference ConvNeXt
(``python/jdet/models/backbones/convnext.py:71-235``): depthwise 7x7 +
LN + pointwise MLP (4x) + layer scale + stochastic depth; stem 4x4/4;
2x2/2 downsample between stages; variants tiny..xlarge (the reference
RoITransformer config uses xlarge).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ...utils.registry import BACKBONES
from ..utils.modules import DropPath, kaiming_normal_fanout, exact_gelu


class ConvNeXtBlock(nn.Module):
    dim: int
    drop_path: float = 0.0
    layer_scale_init: float = 1e-6

    @nn.compact
    def __call__(self, x, train: bool = False):
        shortcut = x
        x = nn.Conv(self.dim, (7, 7), padding=3,
                    feature_group_count=self.dim,
                    kernel_init=kaiming_normal_fanout(),
                    dtype=x.dtype)(x)
        x = nn.LayerNorm(epsilon=1e-6, dtype=x.dtype)(x)
        x = nn.Dense(4 * self.dim, dtype=x.dtype)(x)
        x = exact_gelu(x)
        x = nn.Dense(self.dim, dtype=x.dtype)(x)
        gamma = self.param("gamma",
                           nn.initializers.constant(self.layer_scale_init),
                           (self.dim,))
        x = gamma.astype(x.dtype) * x
        return shortcut + DropPath(self.drop_path)(
            x, deterministic=not train)


class ConvNeXt(nn.Module):
    depths: Sequence[int] = (3, 3, 9, 3)
    dims: Sequence[int] = (96, 192, 384, 768)
    drop_path_rate: float = 0.0
    out_indices: Sequence[int] = (0, 1, 2, 3)

    @nn.compact
    def __call__(self, x, train: bool = False) -> Tuple[jnp.ndarray, ...]:
        dpr = np.linspace(0, self.drop_path_rate, sum(self.depths))
        cur = 0
        outs = []
        for i, (depth, dim) in enumerate(zip(self.depths, self.dims)):
            if i == 0:
                x = nn.Conv(dim, (4, 4), (4, 4), padding=0,
                            kernel_init=kaiming_normal_fanout(),
                            dtype=x.dtype, name="stem")(x)
                x = nn.LayerNorm(epsilon=1e-6, dtype=x.dtype,
                                 name="stem_norm")(x)
            else:
                x = nn.LayerNorm(epsilon=1e-6, dtype=x.dtype,
                                 name=f"down_norm{i}")(x)
                x = nn.Conv(dim, (2, 2), (2, 2), padding=0,
                            kernel_init=kaiming_normal_fanout(),
                            dtype=x.dtype, name=f"down{i}")(x)
            for j in range(depth):
                x = ConvNeXtBlock(dim, float(dpr[cur + j]),
                                  name=f"block{i}_{j}")(x, train)
            cur += depth
            if i in self.out_indices:
                outs.append(nn.LayerNorm(epsilon=1e-6, dtype=x.dtype,
                                         name=f"out_norm{i}")(x))
        return tuple(outs)


_ARCH = {
    "convnext_tiny": dict(depths=(3, 3, 9, 3), dims=(96, 192, 384, 768)),
    "convnext_small": dict(depths=(3, 3, 27, 3),
                           dims=(96, 192, 384, 768)),
    "convnext_base": dict(depths=(3, 3, 27, 3),
                          dims=(128, 256, 512, 1024)),
    "convnext_large": dict(depths=(3, 3, 27, 3),
                           dims=(192, 384, 768, 1536)),
    "convnext_xlarge": dict(depths=(3, 3, 27, 3),
                            dims=(256, 512, 1024, 2048)),
}

for _name, _cfg in _ARCH.items():
    def _ctor(pretrained=False, _cfg=_cfg, **kw):
        kw.pop("in_22k", None)
        return ConvNeXt(**{**_cfg, **kw})
    BACKBONES.register_module(name=_name, module=_ctor)

BACKBONES.register_module(name="ConvNeXt", module=ConvNeXt)
