"""End-to-end smoke tests for Oriented R-CNN: train loss + inference,
tiny shapes (single CPU core budget)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rs_detection_tpu.models.networks.rcnn import OrientedRCNN
from rs_detection_tpu.models.backbones.resnet import ResNet
from rs_detection_tpu.models.necks.fpn import FPN
from rs_detection_tpu.models.roi_heads.oriented_rpn_head import OrientedRPNHead
from rs_detection_tpu.models.roi_heads.oriented_head import OrientedHead


MAX_GT = 8
IMG = 64
B = 1
NUM_CLASSES = 3


def tiny_model():
    return OrientedRCNN(
        backbone=ResNet(depth=18, return_stages=("layer1", "layer2",
                                                 "layer3", "layer4"),
                        norm_eval=False),
        neck=FPN(in_channels=(64, 128, 256, 512), out_channels=32,
                 num_outs=5),
        rpn=OrientedRPNHead(
            in_channels=32, feat_channels=32,
            anchor_generator=dict(scales=[8], ratios=[0.5, 1.0, 2.0],
                                  strides=[4, 8, 16, 32, 64]),
            nms_pre=64, nms_post=32, pre_nms_cap=128,
            sampler=dict(num=32, pos_fraction=0.5)),
        bbox_head=OrientedHead(
            num_classes=NUM_CLASSES, in_channels=32, fc_out_channels=64,
            sampler=dict(num=16, pos_fraction=0.25,
                         add_gt_as_proposals=True),
            bbox_roi_extractor=dict(
                roi_layer=dict(output_size=7, sampling_ratio=2),
                out_channels=32, extend_factor=(1.4, 1.2),
                featmap_strides=[4, 8, 16, 32])),
    )


def make_targets(rng):
    rboxes = np.zeros((B, MAX_GT, 5), np.float32)
    gt_mask = np.zeros((B, MAX_GT), bool)
    labels = np.zeros((B, MAX_GT), np.int32)
    # two gt boxes
    rboxes[0, 0] = [30, 30, 20, 10, 0.3]
    rboxes[0, 1] = [45, 40, 12, 6, -0.5]
    gt_mask[0, :2] = True
    labels[0, :2] = [1, 2]
    return dict(
        rboxes=jnp.asarray(rboxes),
        gt_mask=jnp.asarray(gt_mask),
        labels=jnp.asarray(labels),
        img_hw=jnp.asarray(np.tile([[IMG, IMG]], (B, 1)).astype(np.float32)),
        scale_factor=jnp.ones((B,), jnp.float32),
    )


@pytest.fixture(scope="module")
def setup():
    model = tiny_model()
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.rand(B, IMG, IMG, 3).astype(np.float32))
    targets = make_targets(rng)
    variables = jax.jit(lambda i, t: model.init(
        {"params": jax.random.PRNGKey(0), "sampler": jax.random.PRNGKey(1)},
        i, t))(images, targets)
    return model, variables, images, targets


class TestOrientedRCNN:
    pytestmark = pytest.mark.slow

    def test_train_loss(self, setup):
        model, variables, images, targets = setup
        losses = jax.jit(lambda v, i, t: model.apply(
            v, i, t, method=model.loss,
            rngs={"sampler": jax.random.PRNGKey(2)},
            mutable=["batch_stats"])[0])(variables, images, targets)
        assert set(losses) == {"loss_rpn_cls", "loss_rpn_bbox",
                               "loss_cls", "orcnn_bbox_loss"}
        for k, v in losses.items():
            assert np.isfinite(float(v)), k
            assert float(v) >= 0, k
        # with random init, rpn cls loss should be near log(2)-ish BCE
        assert float(losses["loss_rpn_cls"]) > 0.01

    def test_gradients_finite(self, setup):
        model, variables, images, targets = setup
        params = variables["params"]
        other = {k: v for k, v in variables.items() if k != "params"}

        def total_loss(p):
            losses = model.apply(
                {"params": p, **other}, images, targets,
                method=model.loss,
                rngs={"sampler": jax.random.PRNGKey(2)},
                mutable=["batch_stats"])[0]
            return sum(losses.values())

        g = jax.jit(jax.grad(total_loss))(params)
        leaves = jax.tree_util.tree_leaves(g)
        assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
        # at least some parameters receive gradient
        total = sum(float(np.abs(np.asarray(l)).sum()) for l in leaves)
        assert total > 0

    def test_predict_shapes(self, setup):
        model, variables, images, targets = setup
        out = jax.jit(lambda v, i, t: model.apply(
            v, i, t, method=model.predict))(variables, images, targets)
        assert out["polys"].shape == (B, 32, 8)
        assert out["scores"].shape == (B, 32, NUM_CLASSES)
        assert out["valid"].shape == (B, 32)
        assert np.isfinite(np.asarray(out["polys"])).all()
        s = np.asarray(out["scores"])
        assert (s >= 0).all() and (s <= 1).all()
