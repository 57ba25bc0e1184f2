"""S2ANet end-to-end smoke tests (tiny shapes, jitted)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rs_detection_tpu.models.backbones.resnet import ResNet
from rs_detection_tpu.models.necks.fpn import FPN
from rs_detection_tpu.models.networks.single_stage import S2ANet
from rs_detection_tpu.models.roi_heads.s2anet_head import S2ANetHead

B, IMG, MAX_GT, NC = 1, 64, 8, 4  # NC includes background


def tiny_model():
    return S2ANet(
        backbone=ResNet(depth=18, norm_eval=False),
        neck=FPN(in_channels=(64, 128, 256, 512), out_channels=32,
                 num_outs=5, add_extra_convs="on_input"),
        bbox_head=S2ANetHead(
            num_classes=NC, in_channels=32, feat_channels=32,
            anchor_strides=(4, 8, 16, 32, 64),
            nms_pre=32, max_per_img=16),
    )


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


@pytest.fixture(scope="module")
def setup():
    model = tiny_model()
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.rand(B, IMG, IMG, 3).astype(np.float32))
    targets = make_targets()
    variables = jax.jit(lambda i, t: model.init(
        {"params": jax.random.PRNGKey(0)}, i, t))(images, targets)
    return model, variables, images, targets


class TestS2ANet:
    pytestmark = pytest.mark.slow

    def test_loss(self, setup):
        model, variables, images, targets = setup
        losses = jax.jit(lambda v, i, t: model.apply(
            v, i, t, method=model.loss,
            mutable=["batch_stats"])[0])(variables, images, targets)
        assert set(losses) == {"loss_fam_cls", "loss_fam_bbox",
                               "loss_odm_cls", "loss_odm_bbox"}
        for k, v in losses.items():
            assert np.isfinite(float(v)), k

    def test_grads(self, setup):
        model, variables, images, targets = setup
        params = variables["params"]
        other = {k: v for k, v in variables.items() if k != "params"}

        def total(p):
            losses = model.apply({"params": p, **other}, images, targets,
                                 method=model.loss,
                                 mutable=["batch_stats"])[0]
            return sum(losses.values())

        g = jax.jit(jax.grad(total))(params)
        leaves = jax.tree_util.tree_leaves(g)
        assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
        assert sum(float(np.abs(np.asarray(l)).sum()) for l in leaves) > 0

    def test_predict(self, setup):
        model, variables, images, targets = setup
        out = jax.jit(lambda v, i, t: model.apply(
            v, i, t, method=model.predict))(variables, images, targets)
        assert out["polys"].shape == (B, 16, 8)
        assert out["scores"].shape == (B, 16)
        assert out["labels"].shape == (B, 16)
        assert np.isfinite(np.asarray(out["polys"])).all()
