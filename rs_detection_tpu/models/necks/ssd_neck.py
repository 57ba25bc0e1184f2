"""SSD extra-feature neck (flax.linen, NHWC).

Capability parity with the reference ``SSDNeck``
(``python/jdet/models/necks/ssd_neck.py``, 94 LoC): alternating
1x1-reduce + 3x3-stride-2 extra layers after fc7 producing the
SSD300/512 multi-scale feature set.
"""

from __future__ import annotations

from typing import Sequence, Tuple

from flax import linen as nn

from ...utils.registry import NECKS
from ..utils.modules import kaiming_normal_fanout


@NECKS.register_module()
class SSDNeck(nn.Module):
    # (reduce_channels, out_channels, stride, padding) per extra block
    extra_cfg: Sequence[Tuple[int, int, int, int]] = (
        (256, 512, 2, 1), (128, 256, 2, 1),
        (128, 256, 1, 0), (128, 256, 1, 0))

    @nn.compact
    def __call__(self, inputs, train: bool = False):
        outs = list(inputs)
        x = inputs[-1]
        for i, (red, out, stride, pad) in enumerate(self.extra_cfg):
            x = nn.Conv(red, (1, 1),
                        kernel_init=kaiming_normal_fanout(),
                        dtype=x.dtype, name=f"extra{i}_reduce")(x)
            x = nn.relu(x)
            x = nn.Conv(out, (3, 3), (stride, stride), padding=pad,
                        kernel_init=kaiming_normal_fanout(),
                        dtype=x.dtype, name=f"extra{i}_conv")(x)
            x = nn.relu(x)
            outs.append(x)
        return tuple(outs)
