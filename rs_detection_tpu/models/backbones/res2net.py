"""Res2Net backbone (flax.linen, NHWC).

Capability parity with the reference Res2Net
(``python/jdet/models/backbones/res2net.py``, 273 LoC): the Bottle2neck
multi-scale residual — the 3x3 stage is split into ``scales`` groups
processed hierarchically (each group's conv takes the previous group's
output added in), with ``baseWidth`` channel sizing and v1b deep
stem/avg-down options.
"""

from __future__ import annotations

import math
from typing import Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from ...utils.registry import BACKBONES
from ..utils.modules import Norm, kaiming_normal_fanout


class Bottle2neck(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False
    base_width: int = 26
    scales: int = 4
    expansion: int = 4
    stype: str = "normal"   # "stage" at stage starts

    @nn.compact
    def __call__(self, x, train: bool = False):
        width = int(math.floor(self.planes * (self.base_width / 64.0)))
        identity = x
        out = nn.Conv(width * self.scales, (1, 1), use_bias=False,
                      kernel_init=kaiming_normal_fanout(),
                      dtype=x.dtype)(x)
        out = nn.relu(Norm("bn")(out, train))

        splits = jnp.split(out, self.scales, axis=-1)
        outs = []
        prev = None
        for i in range(self.scales - 1):
            sp = splits[i]
            if prev is not None and self.stype == "normal" \
                    and self.stride == 1:
                sp = sp + prev
            sp = nn.Conv(width, (3, 3), (self.stride,) * 2, padding=1,
                         use_bias=False,
                         kernel_init=kaiming_normal_fanout(),
                         dtype=x.dtype)(sp)
            sp = nn.relu(Norm("bn")(sp, train))
            outs.append(sp)
            prev = sp
        last = splits[-1]
        if self.stride != 1 or self.stype == "stage":
            last = nn.avg_pool(last, (3, 3), (self.stride,) * 2,
                               padding=[(1, 1), (1, 1)])
        outs.append(last)
        out = jnp.concatenate(outs, axis=-1)

        out = nn.Conv(self.planes * self.expansion, (1, 1),
                      use_bias=False,
                      kernel_init=kaiming_normal_fanout(),
                      dtype=x.dtype)(out)
        out = Norm("bn")(out, train)
        if self.downsample:
            if self.stride > 1:
                identity = nn.avg_pool(identity, (self.stride,) * 2,
                                       (self.stride,) * 2)
            identity = nn.Conv(self.planes * self.expansion, (1, 1),
                               use_bias=False,
                               kernel_init=kaiming_normal_fanout(),
                               dtype=x.dtype)(identity)
            identity = Norm("bn")(identity, train)
        return nn.relu(out + identity)


class Res2Net(nn.Module):
    depth: int = 50
    base_width: int = 26
    scales: int = 4
    return_stages: Sequence[str] = ("layer1", "layer2", "layer3",
                                    "layer4")
    norm_eval: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False) -> Tuple[jnp.ndarray, ...]:
        layers = {50: (3, 4, 6, 3), 101: (3, 4, 23, 3)}[self.depth]
        bn_train = train and not self.norm_eval
        # v1b deep stem
        for cout, s in ((32, 2), (32, 1), (64, 1)):
            x = nn.Conv(cout, (3, 3), (s, s), padding=1, use_bias=False,
                        kernel_init=kaiming_normal_fanout(),
                        dtype=x.dtype)(x)
            x = nn.relu(Norm("bn")(x, bn_train))
        x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)),
                    constant_values=-jnp.inf)
        x = nn.max_pool(x, (3, 3), (2, 2))

        outs = []
        planes = 64
        for stage_i, n_blocks in enumerate(layers):
            stride = 1 if stage_i == 0 else 2
            for b in range(n_blocks):
                s = stride if b == 0 else 1
                need_ds = (b == 0 and (s != 1
                                       or x.shape[-1] != planes * 4))
                x = Bottle2neck(planes, s, downsample=need_ds,
                                base_width=self.base_width,
                                scales=self.scales,
                                stype="stage" if b == 0 else "normal",
                                name=f"layer{stage_i+1}_{b}")(x, bn_train)
            if f"layer{stage_i+1}" in self.return_stages:
                outs.append(x)
            planes *= 2
        return tuple(outs)


def _res2net50(pretrained=False, **kw):
    return Res2Net(depth=50, **kw)


def _res2net101(pretrained=False, **kw):
    return Res2Net(depth=101, **kw)


BACKBONES.register_module(name="Res2Net", module=Res2Net)
BACKBONES.register_module(name="res2net50_v1b", module=_res2net50)
BACKBONES.register_module(name="res2net101_v1b", module=_res2net101)
