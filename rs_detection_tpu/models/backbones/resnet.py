"""ResNet backbone family (flax.linen, NHWC).

Capability parity with the reference ResNet
(``python/jdet/models/backbones/resnet.py:95-396``): depths
18/34/26/38/50/101/152, the ``_v1d`` deep-stem variants, stage outputs
selectable via ``return_stages``, ``frozen_stages`` and ``norm_eval``.

TPU-first: NHWC convs, BatchNorm with running stats; frozen stages are
realized with ``stop_gradient`` on their outputs and running-stat norm
(exactly the effect of the reference's requires_grad=False + eval()).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...utils.registry import BACKBONES
from ..utils.modules import Norm, kaiming_normal_fanout


class BasicBlock(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False
    expansion: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        identity = x
        out = nn.Conv(self.planes, (3, 3), (self.stride,) * 2, padding=1,
                      use_bias=False, kernel_init=kaiming_normal_fanout(),
                      dtype=x.dtype)(x)
        out = Norm("bn")(out, train)
        out = nn.relu(out)
        out = nn.Conv(self.planes, (3, 3), padding=1, use_bias=False,
                      kernel_init=kaiming_normal_fanout(), dtype=x.dtype)(out)
        out = Norm("bn")(out, train)
        if self.downsample:
            identity = nn.Conv(self.planes, (1, 1), (self.stride,) * 2,
                               use_bias=False,
                               kernel_init=kaiming_normal_fanout(),
                               dtype=x.dtype)(x)
            identity = Norm("bn")(identity, train)
        return nn.relu(out + identity)


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False
    avg_down: bool = False  # v1d: avgpool in the shortcut
    expansion: int = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        identity = x
        out = nn.Conv(self.planes, (1, 1), use_bias=False,
                      kernel_init=kaiming_normal_fanout(), dtype=x.dtype)(x)
        out = Norm("bn")(out, train)
        out = nn.relu(out)
        out = nn.Conv(self.planes, (3, 3), (self.stride,) * 2, padding=1,
                      use_bias=False, kernel_init=kaiming_normal_fanout(),
                      dtype=x.dtype)(out)
        out = Norm("bn")(out, train)
        out = nn.relu(out)
        out = nn.Conv(self.planes * self.expansion, (1, 1), use_bias=False,
                      kernel_init=kaiming_normal_fanout(), dtype=x.dtype)(out)
        out = Norm("bn")(out, train)
        if self.downsample:
            if self.avg_down and self.stride > 1:
                identity = nn.avg_pool(identity, (self.stride,) * 2,
                                       (self.stride,) * 2)
                identity = nn.Conv(self.planes * self.expansion, (1, 1),
                                   use_bias=False,
                                   kernel_init=kaiming_normal_fanout(),
                                   dtype=x.dtype)(identity)
            else:
                identity = nn.Conv(self.planes * self.expansion, (1, 1),
                                   (self.stride,) * 2, use_bias=False,
                                   kernel_init=kaiming_normal_fanout(),
                                   dtype=x.dtype)(x)
            identity = Norm("bn")(identity, train)
        return nn.relu(out + identity)


_ARCH = {
    18: (BasicBlock, (2, 2, 2, 2)),
    34: (BasicBlock, (3, 4, 6, 3)),
    26: (Bottleneck, (2, 2, 2, 2)),
    38: (BasicBlock, (3, 4, 6, 3)),
    50: (Bottleneck, (3, 4, 6, 3)),
    101: (Bottleneck, (3, 4, 23, 3)),
    152: (Bottleneck, (3, 8, 36, 3)),
}


class ResNet(nn.Module):
    """Args mirror the reference (``resnet.py:95``); stage names in
    ``return_stages`` are layer1..layer4."""

    depth: int = 50
    return_stages: Sequence[str] = ("layer1", "layer2", "layer3", "layer4")
    frozen_stages: int = -1
    norm_eval: bool = True
    deep_stem: bool = False     # v1d stem
    avg_down: bool = False      # v1d shortcut

    @nn.compact
    def __call__(self, x, train: bool = False) -> Tuple[jnp.ndarray, ...]:
        block_cls, layers = _ARCH[self.depth]
        # stage 0 (stem) frozen when frozen_stages >= 0
        stem_train = train and self.frozen_stages < 0 and not self.norm_eval

        if self.deep_stem:
            for i, (cout, s) in enumerate([(32, 2), (32, 1), (64, 1)]):
                x = nn.Conv(cout, (3, 3), (s, s), padding=1, use_bias=False,
                            kernel_init=kaiming_normal_fanout(),
                            dtype=x.dtype)(x)
                x = Norm("bn")(x, stem_train)
                x = nn.relu(x)
        else:
            x = nn.Conv(64, (7, 7), (2, 2), padding=3, use_bias=False,
                        kernel_init=kaiming_normal_fanout(), dtype=x.dtype)(x)
            x = Norm("bn")(x, stem_train)
            x = nn.relu(x)
        if self.frozen_stages >= 0:
            x = jax.lax.stop_gradient(x)
        x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)),
                    constant_values=-jnp.inf)
        x = nn.max_pool(x, (3, 3), (2, 2))

        outs = []
        planes = 64
        for stage_i, n_blocks in enumerate(layers):
            stride = 1 if stage_i == 0 else 2
            frozen = stage_i + 1 <= self.frozen_stages
            stage_train = train and not frozen and not self.norm_eval
            expansion = 4 if block_cls is Bottleneck else 1
            for b in range(n_blocks):
                s = stride if b == 0 else 1
                need_ds = (b == 0
                           and (s != 1 or x.shape[-1] != planes * expansion))
                if block_cls is Bottleneck:
                    x = Bottleneck(planes, s, downsample=need_ds,
                                   avg_down=self.avg_down,
                                   name=f"layer{stage_i+1}_{b}")(
                        x, stage_train)
                else:
                    x = BasicBlock(planes, s, downsample=need_ds,
                                   name=f"layer{stage_i+1}_{b}")(
                        x, stage_train)
            if frozen:
                x = jax.lax.stop_gradient(x)
            if f"layer{stage_i+1}" in self.return_stages:
                outs.append(x)
            planes *= 2
        return tuple(outs)


def _register(depth, **defaults):
    name = f"Resnet{depth}" + ("_v1d" if defaults.get("deep_stem") else "")

    @BACKBONES.register_module(name=name)
    def ctor(**kw):
        cfg = dict(defaults)
        kw.pop("pretrained", None)
        cfg.update(kw)
        return ResNet(depth=depth, **cfg)

    return ctor


for _d in (18, 26, 34, 38, 50, 101, 152):
    _register(_d)
for _d in (50, 101):
    _register(_d, deep_stem=True, avg_down=True)

BACKBONES.register_module(name="ResNet", module=ResNet)
