"""RoI-Transformer and FasterRCNN-OBB networks.

Capability parity with the reference
(``python/jdet/models/networks/roi_transformer.py:9-275``,
``faster_rcnn_obb.py:8``): hbb RPN + cascaded rbox refinement.
"""

from __future__ import annotations

from ...utils.registry import BACKBONES, HEADS, MODELS, NECKS
from ..roi_heads.rbbox_head import RoITransformerHead
from ..roi_heads.rpn_head import RPNHead
from .rcnn import RCNN, _build


@MODELS.register_module()
class RoITransformer(RCNN):
    def setup(self):
        from ..backbones.resnet import ResNet
        from ..necks.fpn import FPN

        self._backbone = _build(self.backbone, BACKBONES,
                                lambda: ResNet(depth=50))
        self._neck = _build(
            self.neck, NECKS,
            lambda: FPN(in_channels=(256, 512, 1024, 2048),
                        out_channels=256, num_outs=5))
        self._rpn = _build(self.rpn, HEADS, RPNHead)
        self._bbox_head = _build(self.bbox_head, HEADS,
                                 RoITransformerHead)


@MODELS.register_module()
class FasterRCNNOBB(RCNN):
    """hbb RPN + rotated second stage (reference
    ``faster_rcnn_obb.py:8``) — realized as the single-refinement
    cascade (stage 2 of the RoI-Transformer applied directly on
    hbb-derived rrois)."""

    def setup(self):
        from ..backbones.resnet import ResNet
        from ..necks.fpn import FPN

        self._backbone = _build(self.backbone, BACKBONES,
                                lambda: ResNet(depth=50))
        self._neck = _build(
            self.neck, NECKS,
            lambda: FPN(in_channels=(256, 512, 1024, 2048),
                        out_channels=256, num_outs=5))
        self._rpn = _build(self.rpn, HEADS, RPNHead)
        self._bbox_head = _build(self.bbox_head, HEADS,
                                 RoITransformerHead)
