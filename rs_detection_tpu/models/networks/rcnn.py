"""Generalized two-stage rotated detector (RCNN) + OrientedRCNN.

Capability parity with the reference networks
(``python/jdet/models/networks/rcnn.py:8-56`` and
``oriented_rcnn.py:5-9``): backbone -> neck -> rpn -> bbox head; train
mode returns the merged loss dict (rpn losses + head losses), eval mode
returns per-image detections.

TPU-first: one linen module with two jit-compiled entry methods
(``loss`` for the train step, ``predict`` for inference), all
static-shape; batched targets are dense padded arrays (see
``data/collate.py``).
"""

from __future__ import annotations

from collections.abc import Mapping
from typing import Any, Dict

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...utils.registry import BACKBONES, HEADS, MODELS, NECKS, build_from_cfg
from ..roi_heads.oriented_head import OrientedHead
from ..roi_heads.oriented_rpn_head import OrientedRPNHead


def _build(cfg, registry, default_cls):
    if cfg is None:
        return default_cls()
    if isinstance(cfg, Mapping):
        from .compat import normalize_cfg

        return build_from_cfg(normalize_cfg(_unfreeze(cfg), registry),
                              registry)
    return cfg


def _unfreeze(node):
    if isinstance(node, Mapping):
        return {k: _unfreeze(v) for k, v in node.items()}
    if isinstance(node, (list, tuple)):
        return [_unfreeze(v) for v in node]
    return node


@MODELS.register_module()
class RCNN(nn.Module):
    backbone: Any = None
    neck: Any = None
    rpn: Any = None
    bbox_head: Any = None
    # bf16 runs convs/FCs/gathers in bfloat16 (box decode and NMS stay
    # f32) — ~2x MXU throughput and half the HBM traffic on TPU
    compute_dtype: Any = None
    # legacy/mmdet-v1 config schema (reference roi_transformer.py:11-19,
    # faster_rcnn_obb.py:11-19) — normalized in setup via compat.py
    rpn_head: Any = None
    bbox_roi_extractor: Any = None
    rbbox_roi_extractor: Any = None
    rbbox_head: Any = None
    shared_head: Any = None
    train_cfg: Any = None
    test_cfg: Any = None
    pretrained: Any = None

    def _rpn_cfg(self):
        from .compat import adapt_rpn_cfg

        if self.rpn is not None:
            return self.rpn
        return adapt_rpn_cfg(self.rpn_head)

    def setup(self):
        from ..backbones.resnet import ResNet
        from ..necks.fpn import FPN

        self._backbone = _build(self.backbone, BACKBONES,
                                lambda: ResNet(depth=50))
        self._neck = _build(
            self.neck, NECKS,
            lambda: FPN(in_channels=(256, 512, 1024, 2048),
                        out_channels=256, num_outs=5))
        self._rpn = _build(self._rpn_cfg(), HEADS, OrientedRPNHead)
        self._bbox_head = _build(self.bbox_head, HEADS, OrientedHead)

    def extract_feats(self, images, train: bool = False):
        if self.compute_dtype is not None:
            images = images.astype(self.compute_dtype)
        feats = self._backbone(images, train=train)
        return self._neck(feats, train=train)

    def __call__(self, images, targets=None, train: bool = False):
        """Init-friendly forward: runs the full predict path."""
        return self.predict(images, targets)

    def loss(self, images, targets) -> Dict[str, jnp.ndarray]:
        """Training losses (train-mode forward).

        Args:
          images: [B, H, W, 3] normalized.
          targets: dict of dense arrays (rboxes, gt_mask, labels,
            img_hw, scale_factor).
        """
        rng = self.make_rng("sampler")
        feats = self.extract_feats(images, train=True)
        cls_scores, bbox_preds = self._rpn(feats, train=True)
        k1, k2 = jax.random.split(rng)
        losses = self._rpn.loss(cls_scores, bbox_preds, targets, k1)
        proposals, p_scores, p_valid = self._rpn.get_proposals(
            [jax.lax.stop_gradient(c) for c in cls_scores],
            [jax.lax.stop_gradient(r) for r in bbox_preds],
            targets["img_hw"])
        head_losses = self._bbox_head.loss(feats, proposals, p_valid,
                                           targets, k2)
        losses.update(head_losses)
        return losses

    def predict(self, images, targets=None) -> Dict[str, jnp.ndarray]:
        """Eval-mode forward: dense detections per image
        (polys/scores/valid; per-tile NMS deferred to merge)."""
        feats = self.extract_feats(images, train=False)
        cls_scores, bbox_preds = self._rpn(feats)
        b = images.shape[0]
        if targets is not None and "img_hw" in targets:
            img_hw = targets["img_hw"]
            scale = targets.get("scale_factor",
                                jnp.ones((b,), jnp.float32))
        else:
            img_hw = jnp.tile(
                jnp.asarray([[images.shape[1], images.shape[2]]],
                            jnp.float32), (b, 1))
            scale = jnp.ones((b,), jnp.float32)
        proposals, p_scores, p_valid = self._rpn.get_proposals(
            cls_scores, bbox_preds, img_hw)
        return self._bbox_head.predict(feats, proposals, p_valid, scale)


@MODELS.register_module()
class OrientedRCNN(RCNN):
    """The competition model (reference ``oriented_rcnn.py:5-9``)."""
