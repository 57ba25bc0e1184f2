"""Gliding Vertex network (hbb RPN + gliding second stage).

Capability parity with the reference ``GlidingVertex``
(``python/jdet/models/networks/gliding_vertex.py:5``).
"""

from __future__ import annotations

from typing import Any

from ...utils.registry import HEADS, MODELS
from ..roi_heads.gliding_head import GlidingHead
from ..roi_heads.rpn_head import GlidingRPNHead
from .rcnn import RCNN, _build


@MODELS.register_module()
class GlidingVertex(RCNN):
    def setup(self):
        from ..backbones.resnet import ResNet
        from ..necks.fpn import FPN
        from ...utils.registry import BACKBONES, NECKS

        self._backbone = _build(self.backbone, BACKBONES,
                                lambda: ResNet(depth=50))
        self._neck = _build(
            self.neck, NECKS,
            lambda: FPN(in_channels=(256, 512, 1024, 2048),
                        out_channels=256, num_outs=5))
        self._rpn = _build(self.rpn, HEADS, GlidingRPNHead)
        self._bbox_head = _build(self.bbox_head, HEADS, GlidingHead)
