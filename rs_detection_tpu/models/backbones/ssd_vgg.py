"""SSD VGG-16 backbone (flax.linen, NHWC).

Capability parity with the reference SSD VGG
(``python/jdet/models/backbones/ssd_vgg.py``, 106 LoC): VGG-16 conv
stack with ceil-mode pool5 (3x3/1), dilated fc6/fc7 convs, L2Norm on
conv4_3; returns (conv4_3, fc7) features.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
from flax import linen as nn

from ...utils.registry import BACKBONES
from ..utils.modules import kaiming_normal_fanout

_VGG16 = ((64, 2), (128, 2), (256, 3), (512, 3), (512, 3))


class L2Norm(nn.Module):
    scale: float = 20.0

    @nn.compact
    def __call__(self, x):
        gamma = self.param("gamma",
                           nn.initializers.constant(self.scale),
                           (x.shape[-1],))
        norm = jnp.sqrt((x * x).sum(-1, keepdims=True) + 1e-10)
        return gamma * x / norm


@BACKBONES.register_module()
class SSDVGG(nn.Module):
    input_size: int = 300
    out_feature_indices: Tuple[int, ...] = (3, 4)

    @nn.compact
    def __call__(self, x, train: bool = False):
        outs = []
        for si, (ch, n) in enumerate(_VGG16):
            for j in range(n):
                x = nn.Conv(ch, (3, 3), padding=1,
                            kernel_init=kaiming_normal_fanout(),
                            dtype=x.dtype, name=f"conv{si+1}_{j+1}")(x)
                x = nn.relu(x)
            if si == 3 and 3 in self.out_feature_indices:
                outs.append(L2Norm(name="l2norm")(x))
            if si < 4:
                x = nn.max_pool(x, (2, 2), (2, 2))
            else:
                # pool5: 3x3 stride 1 (SSD modification)
                x = nn.max_pool(x, (3, 3), (1, 1),
                                padding=[(1, 1), (1, 1)])
        # dilated fc6 + fc7
        x = nn.Conv(1024, (3, 3), padding=6, kernel_dilation=(6, 6),
                    kernel_init=kaiming_normal_fanout(), dtype=x.dtype,
                    name="fc6")(x)
        x = nn.relu(x)
        x = nn.Conv(1024, (1, 1), kernel_init=kaiming_normal_fanout(),
                    dtype=x.dtype, name="fc7")(x)
        x = nn.relu(x)
        if 4 in self.out_feature_indices:
            outs.append(x)
        return tuple(outs)


# reference config name (projects/ssd/configs/ssd300_coco.py uses
# type='SSD_VGG16' with input_size + a pretrained path)
@BACKBONES.register_module(name="SSD_VGG16")
def _ssd_vgg16(input_size=300, pretrained=None, **kw):
    kw.pop("out_feature_indices", None)
    return SSDVGG(input_size=input_size)
