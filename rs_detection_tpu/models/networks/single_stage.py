"""Single-stage detector networks.

Capability parity with the reference networks
(``python/jdet/models/networks/single_stage.py:6-32``, ``s2anet.py``,
``retinanet.py``, ``fcos.py``, ``r3det.py``): backbone -> neck ->
bbox_head, loss dict in train mode, dense detections in eval mode.
"""

from __future__ import annotations

from typing import Any, Dict

from flax import linen as nn

from ...utils.registry import BACKBONES, HEADS, MODELS, NECKS, \
    build_from_cfg


from .rcnn import _build  # noqa: F401  (shared Mapping-aware builder)


@MODELS.register_module()
class SingleStageDetector(nn.Module):
    backbone: Any = None
    neck: Any = None
    bbox_head: Any = None
    # legacy config schema: head under ``roi_heads`` (reference
    # single_stage.py:17) or ``rpn_net`` (retinanet.py:12)
    roi_heads: Any = None
    rpn_net: Any = None
    pretrained: Any = None

    def _head_cfg(self):
        from .compat import adapt_single_stage_head

        cfg = self.bbox_head
        if cfg is None:
            cfg = self.roi_heads
        if cfg is None:
            cfg = self.rpn_net
        return adapt_single_stage_head(cfg)

    def setup(self):
        from ..backbones.resnet import ResNet
        from ..necks.fpn import FPN
        from ..roi_heads.s2anet_head import S2ANetHead

        self._backbone = _build(self.backbone, BACKBONES,
                                lambda: ResNet(depth=50))
        self._neck = _build(
            self.neck, NECKS,
            lambda: FPN(in_channels=(256, 512, 1024, 2048),
                        out_channels=256, num_outs=5,
                        add_extra_convs="on_input"))
        self._bbox_head = _build(self._head_cfg(), HEADS, S2ANetHead)

    def extract_feats(self, images, train=False):
        return self._neck(self._backbone(images, train=train),
                          train=train)

    def __call__(self, images, targets=None, train: bool = False):
        # init-friendly: run the train-mode head forward so train-only
        # branches (e.g. S2ANet FAM cls) get their params created, then
        # the eval decode path (which has no params of its own)
        feats = self.extract_feats(images, train=False)
        outs = self._bbox_head(feats, train=True)
        return self._bbox_head.get_bboxes(outs, targets or {})

    def loss(self, images, targets) -> Dict[str, jnp.ndarray]:
        feats = self.extract_feats(images, train=True)
        outs = self._bbox_head(feats, train=True)
        return self._bbox_head.loss(outs, targets)

    def predict(self, images, targets=None):
        feats = self.extract_feats(images, train=False)
        outs = self._bbox_head(feats, train=False)
        return self._bbox_head.get_bboxes(outs, targets or {})


@MODELS.register_module()
class S2ANet(SingleStageDetector):
    """Reference ``networks/s2anet.py:7-37``."""


@MODELS.register_module()
class RetinaNet(SingleStageDetector):
    """Reference ``networks/retinanet.py:9``."""


@MODELS.register_module()
class FCOS(SingleStageDetector):
    """Reference ``networks/fcos.py:4``."""
