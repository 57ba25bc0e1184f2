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


def _cascade_head_cfg(self):
    """Normalize the head section: mmdet-v1 composed configs carry
    ``rbbox_head``/``bbox_roi_extractor`` stage sections (reference
    roi_transformer configs) — fold them into one RoITransformerHead
    cfg; modern configs pass ``bbox_head`` straight through."""
    from collections.abc import Mapping

    from .compat import adapt_cascade_head

    bh = self.bbox_head
    legacy = (self.rbbox_head is not None
              or self.bbox_roi_extractor is not None
              or (isinstance(bh, Mapping) and "roi_feat_size" in bh))
    if legacy:
        return adapt_cascade_head(
            bh, self.rbbox_head, self.bbox_roi_extractor,
            self.rbbox_roi_extractor, self.train_cfg)
    return bh


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
        self._rpn = _build(self._rpn_cfg(), HEADS, RPNHead)
        self._bbox_head = _build(_cascade_head_cfg(self), HEADS,
                                 RoITransformerHead)


@MODELS.register_module()
class FasterRCNNOBB(RCNN):
    """hbb RPN + one rotated shared-FC stage (reference
    ``faster_rcnn_obb.py:8``): horizontal RoIAlign on the hbb
    proposals, a single FC head classifying and regressing 5-dim rbox
    deltas (``SharedFCBBoxHeadRbbox``), no rotated-align refinement —
    i.e. the RoITransformerHead with ``num_stages=1``."""

    def setup(self):
        import dataclasses

        from ..backbones.resnet import ResNet
        from ..necks.fpn import FPN

        self._backbone = _build(self.backbone, BACKBONES,
                                lambda: ResNet(depth=50))
        self._neck = _build(
            self.neck, NECKS,
            lambda: FPN(in_channels=(256, 512, 1024, 2048),
                        out_channels=256, num_outs=5))
        self._rpn = _build(self._rpn_cfg(), HEADS, RPNHead)
        head = _build(_cascade_head_cfg(self), HEADS,
                      lambda: RoITransformerHead(num_stages=1))
        if isinstance(head, RoITransformerHead) and head.num_stages != 1:
            # modern configs that pass a plain bbox_head section
            # through still get the reference architecture
            head = dataclasses.replace(head, num_stages=1)
        self._bbox_head = head
