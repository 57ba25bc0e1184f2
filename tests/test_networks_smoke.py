"""Loss + predict smoke for every network family not covered by a
dedicated test file (reference test strategy: one regression entry per
project, SURVEY §4): GlidingVertex, RoITransformer, FasterRCNNOBB,
R3Det, SSD, YOLOv5. Tiny shapes; asserts finite losses and a working
predict path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rs_detection_tpu.models.backbones.resnet import ResNet
from rs_detection_tpu.models.necks.fpn import FPN
from rs_detection_tpu.ops import box_ops as B_

B, IMG = 1, 64


@pytest.fixture(scope="module")
def data():
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.rand(B, IMG, IMG, 3).astype(np.float32))
    rboxes = np.zeros((B, 8, 5), np.float32)
    rboxes[0, 0] = [30, 30, 20, 10, 0.3]
    rboxes[0, 1] = [45, 40, 12, 6, -0.4]
    polys = B_.rotated_box_to_poly_np(
        rboxes.reshape(-1, 5)).reshape(B, 8, 8)
    hboxes = np.stack(
        [polys[..., 0::2].min(-1), polys[..., 1::2].min(-1),
         polys[..., 0::2].max(-1), polys[..., 1::2].max(-1)], -1)
    gt_mask = np.zeros((B, 8), bool)
    gt_mask[0, :2] = True
    labels = np.zeros((B, 8), np.int32)
    labels[0, :2] = [1, 2]
    targets = dict(
        rboxes=jnp.asarray(rboxes), hboxes=jnp.asarray(hboxes),
        polys=jnp.asarray(polys), gt_mask=jnp.asarray(gt_mask),
        labels=jnp.asarray(labels),
        img_hw=jnp.asarray([[IMG, IMG]], jnp.float32),
        scale_factor=jnp.ones((B,), np.float32))
    return images, targets


def _bb():
    return ResNet(depth=18, norm_eval=False)


def _neck():
    return FPN(in_channels=(64, 128, 256, 512), out_channels=32,
               num_outs=5, add_extra_convs="on_input")


def _smoke(model, images, targets, expect_losses):
    variables = jax.jit(lambda i, t: model.init(
        {"params": jax.random.PRNGKey(0),
         "sampler": jax.random.PRNGKey(1)}, i, t))(images, targets)
    losses, _ = model.apply(
        variables, images, targets, method=model.loss,
        mutable=["batch_stats", "loss_state"],
        rngs={"sampler": jax.random.PRNGKey(2)})
    assert set(expect_losses) <= set(losses), sorted(losses)
    for k, l in losses.items():
        assert np.isfinite(float(l)), (k, float(l))
    model.apply(variables, images, targets, method=model.predict)


_RT_HEAD = dict(type="RoITransformerHead", num_classes=15,
                in_channels=32, sampler_num=16, pos_fraction=0.25,
                featmap_strides=[4, 8, 16, 32])
_RPN = dict(type="RPNHead", in_channels=32, feat_channels=32,
            nms_pre=64, nms_post=32)


@pytest.mark.slow
def test_gliding_vertex(data):
    from rs_detection_tpu.models.networks.gliding_vertex import \
        GlidingVertex

    model = GlidingVertex(
        backbone=_bb(), neck=_neck(),
        rpn=dict(type="GlidingRPNHead", in_channels=32,
                 feat_channels=32, nms_pre=64, nms_post=32),
        bbox_head=dict(
            type="GlidingHead", num_classes=15, in_channels=32,
            fc_out_channels=64, sampler=dict(num=16, pos_fraction=0.25),
            bbox_roi_extractor=dict(
                roi_layer=dict(output_size=7, sampling_ratio=2),
                out_channels=32, featmap_strides=[4, 8, 16, 32])))
    _smoke(model, *data, ["gliding_cls_loss", "gliding_fix_loss",
                          "gliding_ratio_loss", "loss_rpn_cls"])


@pytest.mark.slow
def test_roi_transformer(data):
    from rs_detection_tpu.models.networks.roi_transformer import \
        RoITransformer

    model = RoITransformer(backbone=_bb(), neck=_neck(), rpn=_RPN,
                           bbox_head=_RT_HEAD)
    _smoke(model, *data, ["rbbox_cls_loss_1", "rbbox_reg_loss_2"])


@pytest.mark.slow
def test_roi_transformer_kfiou(data):
    """KFIoUSharedFCBBoxHeadRbbox parity: stage-2 regression via the
    Kalman-filter IoU loss (reference convfc_rbbox_head.py:213)."""
    from rs_detection_tpu.models.networks.roi_transformer import \
        RoITransformer

    model = RoITransformer(backbone=_bb(), neck=_neck(), rpn=_RPN,
                           bbox_head=dict(_RT_HEAD, reg_loss="kfiou"))
    _smoke(model, *data, ["rbbox_cls_loss_1", "rbbox_reg_loss_2"])


@pytest.mark.slow
def test_faster_rcnn_obb(data):
    from rs_detection_tpu.models.networks.roi_transformer import \
        FasterRCNNOBB

    model = FasterRCNNOBB(backbone=_bb(), neck=_neck(), rpn=_RPN,
                          bbox_head=_RT_HEAD)
    _smoke(model, *data, ["rbbox_cls_loss_1"])


@pytest.mark.slow
def test_r3det(data):
    from rs_detection_tpu.models.networks.r3det import R3Det
    from rs_detection_tpu.models.roi_heads.retina_head import RetinaHead

    model = R3Det(backbone=_bb(), neck=_neck(),
                  bbox_head=RetinaHead(num_classes=4, in_channels=32,
                                       feat_channels=32))
    _smoke(model, *data, ["loss_cls", "loss_refine_cls",
                          "loss_refine_bbox"])


@pytest.mark.slow
def test_ssd(data):
    from rs_detection_tpu.models.roi_heads.ssd_head import SSD

    model = SSD(backbone=dict(type="SSDVGG"), neck=dict(type="SSDNeck"),
                bbox_head=dict(type="SSDHead", num_classes=4))
    _smoke(model, *data, ["loss_cls", "loss_bbox"])


@pytest.mark.slow
def test_yolo(data):
    from rs_detection_tpu.models.networks.yolo import YOLO

    model = YOLO(bbox_head=dict(type="YOLOv5Head", num_classes=4))
    _smoke(model, *data, ["box_loss", "obj_loss", "cls_loss"])
