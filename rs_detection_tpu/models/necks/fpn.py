"""Feature Pyramid Network (flax.linen, NHWC).

Capability parity with the reference FPN
(``python/jdet/models/necks/fpn.py:9-202``): lateral 1x1 convs,
top-down nearest-neighbor upsample, 3x3 output convs, extra levels via
``add_extra_convs`` (on_input / on_lateral / on_output) or max-pool,
``relu_before_extra_convs``, ``start_level`` / ``end_level``.
"""

from __future__ import annotations

from typing import Optional, Sequence, Union

import jax.numpy as jnp
from flax import linen as nn

from ...ops.quant import MaybeInt8Conv
from ...utils.registry import NECKS
from ..utils.modules import kaiming_normal_fanout


def _upsample_nearest(x, shape):
    n, h, w, c = x.shape
    th, tw = shape
    # integer-ratio nearest upsample (FPN always doubles)
    ry, rx = th // h, tw // w
    out = jnp.repeat(jnp.repeat(x, ry, axis=1), rx, axis=2)
    return out[:, :th, :tw]


@NECKS.register_module()
class FPN(nn.Module):
    in_channels: Sequence[int] = (256, 512, 1024, 2048)
    out_channels: int = 256
    num_outs: int = 5
    start_level: int = 0
    end_level: int = -1
    add_extra_convs: Union[bool, str] = False
    relu_before_extra_convs: bool = False
    no_norm_on_lateral: bool = True
    upsample_cfg: Optional[dict] = None

    @nn.compact
    def __call__(self, inputs, train: bool = False):
        assert len(inputs) == len(self.in_channels)
        end = (len(self.in_channels)
               if self.end_level == -1 else self.end_level)
        used = list(inputs[self.start_level:end])

        # MaybeInt8Conv == nn.Conv (same param tree) unless the int8
        # serving flag routes the dense convs through the MXU s8 path
        laterals = [
            MaybeInt8Conv(self.out_channels, (1, 1), dtype=feat.dtype,
                          kernel_init=kaiming_normal_fanout(),
                          name=f"lateral_{i}")(feat, train)
            for i, feat in enumerate(used)
        ]
        # top-down pathway
        for i in range(len(laterals) - 1, 0, -1):
            laterals[i - 1] = laterals[i - 1] + _upsample_nearest(
                laterals[i], laterals[i - 1].shape[1:3])
        outs = [
            MaybeInt8Conv(self.out_channels, (3, 3), padding=1,
                          dtype=laterals[i].dtype,
                          kernel_init=kaiming_normal_fanout(),
                          name=f"fpn_conv_{i}")(laterals[i], train)
            for i in range(len(laterals))
        ]
        # extra levels
        extra_needed = self.num_outs - len(outs)
        if extra_needed > 0:
            if not self.add_extra_convs:
                for _ in range(extra_needed):
                    outs.append(nn.max_pool(outs[-1], (1, 1), (2, 2)))
            else:
                mode = (self.add_extra_convs
                        if isinstance(self.add_extra_convs, str)
                        else "on_input")
                if mode == "on_input":
                    src = used[-1]
                elif mode == "on_lateral":
                    src = laterals[-1]
                else:
                    src = outs[-1]
                for j in range(extra_needed):
                    if j > 0 and self.relu_before_extra_convs:
                        src = nn.relu(src)
                    src = MaybeInt8Conv(
                        self.out_channels, (3, 3), (2, 2),
                        padding=1, dtype=src.dtype,
                        kernel_init=kaiming_normal_fanout(),
                        name=f"extra_conv_{j}")(src, train)
                    outs.append(src)
        return tuple(outs)
