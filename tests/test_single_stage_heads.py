"""RetinaNet (rotated) + FCOS smoke tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rs_detection_tpu.models.backbones.resnet import ResNet
from rs_detection_tpu.models.necks.fpn import FPN
from rs_detection_tpu.models.networks.single_stage import (FCOS, RetinaNet)
from rs_detection_tpu.models.roi_heads.fcos_head import FCOSHead
from rs_detection_tpu.models.roi_heads.retina_head import RetinaHead

B, IMG, MAX_GT = 1, 64, 8


def make_targets():
    rboxes = np.zeros((B, MAX_GT, 5), np.float32)
    gt_mask = np.zeros((B, MAX_GT), bool)
    labels = np.zeros((B, MAX_GT), np.int32)
    rboxes[0, 0] = [30, 30, 20, 10, 0.3]
    rboxes[0, 1] = [45, 40, 12, 6, -0.2]
    gt_mask[0, :2] = True
    labels[0, :2] = [1, 3]
    return dict(rboxes=jnp.asarray(rboxes), gt_mask=jnp.asarray(gt_mask),
                labels=jnp.asarray(labels),
                img_hw=jnp.asarray(np.tile([[IMG, IMG]], (B, 1))
                                   .astype(np.float32)),
                scale_factor=jnp.ones((B,), np.float32))


def neck():
    return FPN(in_channels=(64, 128, 256, 512), out_channels=32,
               num_outs=5, add_extra_convs="on_input")


def run_model(model, loss_keys, out_extra=()):
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.rand(B, IMG, IMG, 3).astype(np.float32))
    targets = make_targets()
    variables = jax.jit(lambda i, t: model.init(
        {"params": jax.random.PRNGKey(0)}, i, t))(images, targets)
    losses = jax.jit(lambda v, i, t: model.apply(
        v, i, t, method=model.loss,
        mutable=["batch_stats"])[0])(variables, images, targets)
    assert set(losses) == set(loss_keys)
    for k, v in losses.items():
        assert np.isfinite(float(v)), (k, float(v))
    out = jax.jit(lambda v, i, t: model.apply(
        v, i, t, method=model.predict))(variables, images, targets)
    assert np.isfinite(np.asarray(out["polys"])).all()
    return losses, out


pytestmark = pytest.mark.slow


class TestRetina:
    def test_e2e(self):
        model = RetinaNet(
            backbone=ResNet(depth=18, norm_eval=False), neck=neck(),
            bbox_head=RetinaHead(num_classes=4, in_channels=32,
                                 feat_channels=32,
                                 anchor_strides=(4, 8, 16, 32, 64),
                                 nms_pre=32, max_per_img=16))
        run_model(model, ["loss_cls", "loss_bbox"])


class TestFCOS:
    def test_e2e(self):
        model = FCOS(
            backbone=ResNet(depth=18, norm_eval=False), neck=neck(),
            bbox_head=FCOSHead(num_classes=3, in_channels=32,
                               feat_channels=32, stacked_convs=2,
                               strides=(4, 8, 16, 32, 64),
                               regress_ranges=((-1, 16), (16, 32),
                                               (32, 64), (64, 128),
                                               (128, 1e8)),
                               nms_pre=32, max_per_img=16))
        run_model(model, ["loss_cls", "loss_bbox", "loss_centerness"])
