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


# registered as a constructor so both schemas build: this repo's
# explicit extra_cfg tuples AND the reference's flat channel/stride/
# padding lists (projects/ssd/configs/ssd300_coco.py)
@NECKS.register_module(name="SSDNeck")
def _ssd_neck(extra_cfg=None,
              in_channels=(512, 1024),
              out_channels=(512, 1024, 512, 256, 256, 256),
              level_strides=(2, 2, 1, 1),
              level_paddings=(1, 1, 0, 0),
              l2_norm_scale=20, **kw):
    if extra_cfg is not None:
        return SSDNeck(extra_cfg=tuple(tuple(e) for e in extra_cfg))
    extras = []
    n_base = len(in_channels)
    for i, (stride, pad) in enumerate(zip(level_strides,
                                          level_paddings)):
        out = out_channels[n_base + i]
        extras.append((max(out // 2, 128), out, stride, pad))
    return SSDNeck(extra_cfg=tuple(extras))
