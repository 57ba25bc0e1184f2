"""Golden-loss regression harness.

The reference's primary model-correctness mechanism
(``projects/*/test_*.py`` + ``docs/add_model_tests.md``, SURVEY §4):
fixed weights + fixed batches -> per-iteration losses after
``optimizer.step`` must match a recorded fixture within a relative
tolerance. JAX determinism makes this exact up to compiler numerics,
so the tolerance here is tighter than the reference's 0.2.

Run with ``--record`` semantics: if the fixture file is absent it is
created (first run on a new machine records; CI then enforces).

Scope caveat (keep visible): these fixtures are SELF-recorded — they
pin THIS framework's loss stream against regressions, they do not
encode the reference's Jittor losses (the reference fixtures in
``projects/*/test_*.py`` do; reproducing them requires running
Jittor, which this environment cannot). Cross-framework numeric
parity is covered separately by ``tests/test_torch_parity*.py``.
"""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

REL_TOL = 0.05
N_ITERS = 4


def build_orcnn():
    from rs_detection_tpu.models.backbones.resnet import ResNet
    from rs_detection_tpu.models.necks.fpn import FPN
    from rs_detection_tpu.models.networks.rcnn import OrientedRCNN
    from rs_detection_tpu.models.roi_heads.oriented_head import \
        OrientedHead
    from rs_detection_tpu.models.roi_heads.oriented_rpn_head import \
        OrientedRPNHead
    from rs_detection_tpu.optims.optimizer import SGD
    from rs_detection_tpu.parallel.train_step import (create_train_state,
                                                      make_train_step)

    model = OrientedRCNN(
        backbone=ResNet(depth=18, norm_eval=False),
        neck=FPN(in_channels=(64, 128, 256, 512), out_channels=32,
                 num_outs=5),
        rpn=OrientedRPNHead(in_channels=32, feat_channels=32,
                            nms_pre=64, nms_post=32, pre_nms_cap=128,
                            sampler=dict(num=32, pos_fraction=0.5)),
        bbox_head=OrientedHead(
            num_classes=3, in_channels=32, fc_out_channels=64,
            sampler=dict(num=16, pos_fraction=0.25),
            bbox_roi_extractor=dict(
                roi_layer=dict(output_size=7, sampling_ratio=2),
                out_channels=32, extend_factor=(1.4, 1.2),
                featmap_strides=[4, 8, 16, 32])))

    img = 64
    rng = np.random.RandomState(42)
    images = jnp.asarray(rng.rand(1, img, img, 3).astype(np.float32))
    rboxes = np.zeros((1, 8, 5), np.float32)
    rboxes[0, 0] = [30, 30, 20, 10, 0.3]
    rboxes[0, 1] = [45, 40, 12, 6, -0.5]
    gt_mask = np.zeros((1, 8), bool)
    gt_mask[0, :2] = True
    labels = np.zeros((1, 8), np.int32)
    labels[0, :2] = [1, 2]
    targets = dict(
        rboxes=jnp.asarray(rboxes), gt_mask=jnp.asarray(gt_mask),
        labels=jnp.asarray(labels),
        img_hw=jnp.asarray([[img, img]], jnp.float32),
        scale_factor=jnp.ones((1,), jnp.float32))

    variables = jax.jit(lambda i, t: model.init(
        {"params": jax.random.PRNGKey(0),
         "sampler": jax.random.PRNGKey(1)}, i, t))(images, targets)
    # deterministic lr like the reference golden recipe (enlarged to
    # amplify backward errors, docs/add_model_tests.md)
    tx = SGD(lr=0.01, momentum=0.9, grad_clip=dict(max_norm=35))
    state = create_train_state(model, variables, tx)
    step = make_train_step(model, tx, mesh=None)
    return step, state, images, targets


def _tiny_targets(img=64):
    rboxes = np.zeros((1, 8, 5), np.float32)
    rboxes[0, 0] = [30, 30, 20, 10, 0.3]
    rboxes[0, 1] = [45, 40, 12, 6, -0.5]
    gt_mask = np.zeros((1, 8), bool)
    gt_mask[0, :2] = True
    labels = np.zeros((1, 8), np.int32)
    labels[0, :2] = [1, 2]
    return dict(
        rboxes=jnp.asarray(rboxes), gt_mask=jnp.asarray(gt_mask),
        labels=jnp.asarray(labels),
        img_hw=jnp.asarray([[img, img]], jnp.float32),
        scale_factor=jnp.ones((1,), jnp.float32))


def _finish(model, images, targets):
    from rs_detection_tpu.optims.optimizer import SGD
    from rs_detection_tpu.parallel.train_step import (create_train_state,
                                                      make_train_step)

    variables = jax.jit(lambda i, t: model.init(
        {"params": jax.random.PRNGKey(0),
         "sampler": jax.random.PRNGKey(1)}, i, t))(images, targets)
    tx = SGD(lr=0.01, momentum=0.9, grad_clip=dict(max_norm=35))
    state = create_train_state(model, variables, tx)
    step = make_train_step(model, tx, mesh=None)
    return step, state, images, targets


def build_s2anet():
    from rs_detection_tpu.models.backbones.resnet import ResNet
    from rs_detection_tpu.models.necks.fpn import FPN
    from rs_detection_tpu.models.networks.single_stage import S2ANet
    from rs_detection_tpu.models.roi_heads.s2anet_head import S2ANetHead

    model = S2ANet(
        backbone=ResNet(depth=18, norm_eval=False),
        neck=FPN(in_channels=(64, 128, 256, 512), out_channels=32,
                 num_outs=5, add_extra_convs="on_input"),
        bbox_head=S2ANetHead(
            num_classes=3, in_channels=32, feat_channels=32,
            anchor_strides=(4, 8, 16, 32, 64),
            nms_pre=32, max_per_img=16))
    img = 64
    rng = np.random.RandomState(42)
    images = jnp.asarray(rng.rand(1, img, img, 3).astype(np.float32))
    return _finish(model, images, _tiny_targets(img))


def build_retinanet():
    from rs_detection_tpu.models.backbones.resnet import ResNet
    from rs_detection_tpu.models.necks.fpn import FPN
    from rs_detection_tpu.models.networks.single_stage import RetinaNet
    from rs_detection_tpu.models.roi_heads.retina_head import RetinaHead

    model = RetinaNet(
        backbone=ResNet(depth=18, norm_eval=False),
        neck=FPN(in_channels=(64, 128, 256, 512), out_channels=32,
                 num_outs=5, add_extra_convs="on_input"),
        bbox_head=RetinaHead(num_classes=3, in_channels=32,
                             feat_channels=32))
    img = 64
    rng = np.random.RandomState(42)
    images = jnp.asarray(rng.rand(1, img, img, 3).astype(np.float32))
    return _finish(model, images, _tiny_targets(img))


def _rich_targets(img=64):
    """Targets with hboxes/polys for the two-stage hbb-RPN models
    (same boxes as _tiny_targets)."""
    from rs_detection_tpu.ops import box_ops as B
    t = _tiny_targets(img)
    polys = B.rotated_box_to_poly(np.asarray(t["rboxes"]).reshape(-1, 5))
    polys = jnp.asarray(polys).reshape(1, 8, 8)
    hboxes = jnp.stack([polys[..., 0::2].min(-1), polys[..., 1::2].min(-1),
                        polys[..., 0::2].max(-1), polys[..., 1::2].max(-1)],
                       -1)
    t["polys"] = polys
    t["hboxes"] = hboxes
    return t


def build_fcos():
    from rs_detection_tpu.models.backbones.resnet import ResNet
    from rs_detection_tpu.models.necks.fpn import FPN
    from rs_detection_tpu.models.networks.single_stage import FCOS
    from rs_detection_tpu.models.roi_heads.fcos_head import FCOSHead

    model = FCOS(
        backbone=ResNet(depth=18, norm_eval=False),
        neck=FPN(in_channels=(64, 128, 256, 512), out_channels=32,
                 num_outs=5, add_extra_convs="on_input"),
        bbox_head=FCOSHead(num_classes=3, in_channels=32,
                           feat_channels=32, stacked_convs=2,
                           strides=(4, 8, 16, 32, 64),
                           regress_ranges=((-1, 16), (16, 32), (32, 64),
                                           (64, 128), (128, 1e8)),
                           nms_pre=32, max_per_img=16))
    img = 64
    rng = np.random.RandomState(42)
    images = jnp.asarray(rng.rand(1, img, img, 3).astype(np.float32))
    return _finish(model, images, _tiny_targets(img))


def _resnet_fpn32():
    from rs_detection_tpu.models.backbones.resnet import ResNet
    from rs_detection_tpu.models.necks.fpn import FPN
    return (ResNet(depth=18, norm_eval=False),
            FPN(in_channels=(64, 128, 256, 512), out_channels=32,
                num_outs=5, add_extra_convs="on_input"))


def build_gliding():
    from rs_detection_tpu.models.networks.gliding_vertex import \
        GlidingVertex

    bb, neck = _resnet_fpn32()
    model = GlidingVertex(
        backbone=bb, neck=neck,
        rpn=dict(type="GlidingRPNHead", in_channels=32,
                 feat_channels=32, nms_pre=64, nms_post=32),
        bbox_head=dict(
            type="GlidingHead", num_classes=15, in_channels=32,
            fc_out_channels=64, sampler=dict(num=16, pos_fraction=0.25),
            bbox_roi_extractor=dict(
                roi_layer=dict(output_size=7, sampling_ratio=2),
                out_channels=32, featmap_strides=[4, 8, 16, 32])))
    img = 64
    rng = np.random.RandomState(42)
    images = jnp.asarray(rng.rand(1, img, img, 3).astype(np.float32))
    return _finish(model, images, _rich_targets(img))


def build_roitrans():
    from rs_detection_tpu.models.networks.roi_transformer import \
        RoITransformer

    bb, neck = _resnet_fpn32()
    model = RoITransformer(
        backbone=bb, neck=neck,
        rpn=dict(type="RPNHead", in_channels=32, feat_channels=32,
                 nms_pre=64, nms_post=32),
        bbox_head=dict(type="RoITransformerHead", num_classes=15,
                       in_channels=32, sampler_num=16,
                       pos_fraction=0.25,
                       featmap_strides=[4, 8, 16, 32]))
    img = 64
    rng = np.random.RandomState(42)
    images = jnp.asarray(rng.rand(1, img, img, 3).astype(np.float32))
    return _finish(model, images, _rich_targets(img))


def build_r3det():
    from rs_detection_tpu.models.networks.r3det import R3Det
    from rs_detection_tpu.models.roi_heads.retina_head import RetinaHead

    bb, neck = _resnet_fpn32()
    model = R3Det(backbone=bb, neck=neck,
                  bbox_head=RetinaHead(num_classes=4, in_channels=32,
                                       feat_channels=32))
    img = 64
    rng = np.random.RandomState(42)
    images = jnp.asarray(rng.rand(1, img, img, 3).astype(np.float32))
    return _finish(model, images, _rich_targets(img))


def build_ssd():
    from rs_detection_tpu.models.roi_heads.ssd_head import SSD

    model = SSD(backbone=dict(type="SSDVGG"),
                neck=dict(type="SSDNeck"),
                bbox_head=dict(type="SSDHead", num_classes=4))
    img = 64
    rng = np.random.RandomState(42)
    images = jnp.asarray(rng.rand(1, img, img, 3).astype(np.float32))
    return _finish(model, images, _rich_targets(img))


def build_yolo():
    from rs_detection_tpu.models.networks.yolo import YOLO

    model = YOLO(bbox_head=dict(type="YOLOv5Head", num_classes=4))
    img = 64
    rng = np.random.RandomState(42)
    images = jnp.asarray(rng.rand(1, img, img, 3).astype(np.float32))
    return _finish(model, images, _rich_targets(img))


_BUILDERS = {"orcnn": build_orcnn, "s2anet": build_s2anet,
             "retinanet": build_retinanet, "fcos": build_fcos,
             "gliding": build_gliding, "roitrans": build_roitrans,
             "r3det": build_r3det, "ssd": build_ssd,
             "yolo": build_yolo}


@pytest.mark.slow
@pytest.mark.parametrize("name", sorted(_BUILDERS))
def test_golden_losses(name):
    fixture = os.path.join(os.path.dirname(__file__), "fixtures",
                           f"golden_losses_{name}.json")
    step, state, images, targets = _BUILDERS[name]()
    rng = jax.random.PRNGKey(3)
    losses = []
    for _ in range(N_ITERS):
        state, metrics = step(state, images, targets, rng)
        losses.append(float(metrics["total_loss"]))
    assert all(np.isfinite(l) for l in losses)

    if not os.path.exists(fixture):
        os.makedirs(os.path.dirname(fixture), exist_ok=True)
        with open(fixture, "w") as f:
            json.dump({"losses": losses}, f, indent=2)
        pytest.skip("fixture recorded; rerun to enforce")

    with open(fixture) as f:
        golden = json.load(f)["losses"]
    for i, (got, want) in enumerate(zip(losses, golden)):
        rel = abs(got - want) / max(abs(want), 1e-6)
        assert rel < REL_TOL, (i, got, want)
