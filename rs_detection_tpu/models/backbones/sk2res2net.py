"""SK2Res2Net backbone (flax.linen, NHWC).

Capability parity with the reference SK2Res2Net
(``python/jdet/models/backbones/sk2res2net.py``, 509 LoC): a Res2Net
whose Bottle2neck adds a selective-kernel gate (``SKLayer``,
ref :354-369) that fuses the pre-hierarchical-conv tensor with the
multi-scale conv output via a learned sigmoid gate computed from
global-average-pooled statistics, plus grouped (``cardinality``) 3x3
convs and whole-tensor average-pool downsampling at stage starts
(ref Bottle2neck :371-455, SK2Layer :456-469).

TPU notes: the SK gate is two 1x1 convs on a [N,1,1,C] pooled tensor —
negligible FLOPs, fully fused by XLA. All convs are NHWC with static
shapes; stage pooling uses ``nn.avg_pool`` before the channel split so
the hierarchical convs are stride 1 (exactly the reference dataflow).
"""

from __future__ import annotations

import math
from typing import Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from ...utils.registry import BACKBONES
from ..utils.modules import Norm, kaiming_normal_fanout


class SKLayer(nn.Module):
    """Selective-kernel gate: ``out = x + sigmoid(proj(fuse)) * (fx - x)``
    where ``fuse`` blends GAP(x) / GAP(fx) by a learned scalar alpha
    (reference sk2res2net.py:354-369)."""

    ratio: int = 8

    @nn.compact
    def __call__(self, x, fx, train: bool = False):
        c = x.shape[-1]
        hidden = max(32, c // self.ratio)
        alpha = self.param("alpha", nn.initializers.zeros, (1,))
        a = nn.sigmoid(alpha.astype(x.dtype))
        gx = x.mean(axis=(1, 2), keepdims=True)
        gf = fx.mean(axis=(1, 2), keepdims=True)
        fuse = a * gx + (1.0 - a) * gf
        h = nn.Conv(hidden, (1, 1), use_bias=False,
                    kernel_init=kaiming_normal_fanout(),
                    dtype=x.dtype, name="proj1")(fuse)
        h = nn.relu(Norm("bn")(h, train))
        sk = nn.sigmoid(nn.Conv(c, (1, 1), use_bias=True,
                                kernel_init=kaiming_normal_fanout(),
                                dtype=x.dtype, name="proj2")(h))
        return x + sk * (fx - x)


class SK2Bottle2neck(nn.Module):
    """Reference Bottle2neck (sk2res2net.py:371-455): 1x1 reduce ->
    (stage: 3x3 avg-pool stride s on the whole tensor) -> split into
    ``scales`` width-groups -> hierarchical grouped 3x3 convs over the
    first scales-1 groups -> SK gate between pre/post-conv tensors ->
    1x1 expand, avg-down residual."""

    planes: int
    stride: int = 1
    downsample: bool = False
    base_width: int = 26
    scales: int = 4
    cardinality: int = 1
    ratio: int = 8
    expansion: int = 4
    stype: str = "normal"

    @nn.compact
    def __call__(self, x, train: bool = False):
        width = int(math.floor(self.planes * (self.base_width / 64.0)))
        identity = x
        out = nn.Conv(width * self.scales, (1, 1), use_bias=False,
                      kernel_init=kaiming_normal_fanout(),
                      dtype=x.dtype)(x)
        out = nn.relu(Norm("bn")(out, train))
        if self.stype == "stage" and self.stride != 1:
            out = nn.avg_pool(out, (3, 3), (self.stride,) * 2,
                              padding=[(1, 1), (1, 1)])

        splits = jnp.split(out, self.scales, axis=-1)
        old_out = out
        outs = []
        prev = None
        for i in range(self.scales - 1):
            sp = splits[i]
            if prev is not None and self.stype == "normal":
                sp = sp + prev
            sp = nn.Conv(width, (3, 3), padding=1, use_bias=False,
                         feature_group_count=self.cardinality,
                         kernel_init=kaiming_normal_fanout(),
                         dtype=x.dtype)(sp)
            sp = nn.relu(Norm("bn")(sp, train))
            outs.append(sp)
            prev = sp
        outs.append(splits[-1])
        out = jnp.concatenate(outs, axis=-1)
        out = SKLayer(ratio=self.ratio, name="sk")(old_out, out, train)

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


@BACKBONES.register_module()
class SK2Res2Net(nn.Module):
    """Reference SK2Res2Net (sk2res2net.py:471-509): v1b deep stem +
    avg-down, SK2 bottlenecks throughout."""

    depth: int = 101
    base_width: int = 26
    scales: int = 4
    cardinality: int = 1
    ratio: int = 8
    return_stages: Sequence[str] = ("layer1", "layer2", "layer3",
                                    "layer4")
    norm_eval: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False) -> Tuple[jnp.ndarray, ...]:
        layers = {50: (3, 4, 6, 3), 101: (3, 4, 23, 3),
                  152: (3, 8, 36, 3)}[self.depth]
        bn_train = train and not self.norm_eval
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
                x = SK2Bottle2neck(
                    planes, s, downsample=need_ds,
                    base_width=self.base_width, scales=self.scales,
                    cardinality=self.cardinality, ratio=self.ratio,
                    stype="stage" if b == 0 else "normal",
                    name=f"layer{stage_i+1}_{b}")(x, bn_train)
            if f"layer{stage_i+1}" in self.return_stages:
                outs.append(x)
            planes *= 2
        return tuple(outs)


def _sk2res2net101(pretrained=False, **kw):
    return SK2Res2Net(depth=101, **kw)


BACKBONES.register_module(name="sk2res2net101_v1b",
                          module=_sk2res2net101)
