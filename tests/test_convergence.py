"""Optimization sanity: training on a fixed batch must reduce loss.

Golden-loss fixtures pin exact values; this guards the complementary
property (gradients point downhill through the full assign/sample/
encode pipeline) that smoke tests can't see. Mirrors the reference's
"training improves" expectation from its regression recipe
(``docs/add_model_tests.md``: enlarged lr amplifies backward errors).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


@pytest.mark.slow
def test_retinanet_overfits_fixed_batch():
    from rs_detection_tpu.models.backbones.resnet import ResNet
    from rs_detection_tpu.models.necks.fpn import FPN
    from rs_detection_tpu.models.networks.single_stage import RetinaNet
    from rs_detection_tpu.models.roi_heads.retina_head import RetinaHead
    from rs_detection_tpu.optims.optimizer import SGD
    from rs_detection_tpu.parallel.train_step import (create_train_state,
                                                      make_train_step)

    model = RetinaNet(
        backbone=ResNet(depth=18, norm_eval=False),
        neck=FPN(in_channels=(64, 128, 256, 512), out_channels=32,
                 num_outs=5, add_extra_convs="on_input"),
        bbox_head=RetinaHead(num_classes=3, in_channels=32,
                             feat_channels=32))
    img = 64
    rng = np.random.RandomState(7)
    images = jnp.asarray(rng.rand(1, img, img, 3).astype(np.float32))
    rboxes = np.zeros((1, 8, 5), np.float32)
    rboxes[0, 0] = [30, 30, 20, 10, 0.3]
    gt_mask = np.zeros((1, 8), bool)
    gt_mask[0, 0] = True
    labels = np.zeros((1, 8), np.int32)
    labels[0, 0] = 1
    targets = dict(
        rboxes=jnp.asarray(rboxes), gt_mask=jnp.asarray(gt_mask),
        labels=jnp.asarray(labels),
        img_hw=jnp.asarray([[img, img]], jnp.float32),
        scale_factor=jnp.ones((1,), jnp.float32))

    variables = jax.jit(lambda i, t: model.init(
        {"params": jax.random.PRNGKey(0),
         "sampler": jax.random.PRNGKey(1)}, i, t))(images, targets)
    tx = SGD(lr=0.005, momentum=0.9, grad_clip=dict(max_norm=35))
    state = create_train_state(model, variables, tx)
    step = make_train_step(model, tx, mesh=None)

    key = jax.random.PRNGKey(11)
    losses = []
    for _ in range(30):
        state, metrics = step(state, images, targets, key)
        losses.append(float(metrics["total_loss"]))
    assert all(np.isfinite(l) for l in losses), losses
    first = np.mean(losses[:5])
    last = np.mean(losses[-5:])
    assert last < 0.7 * first, (first, last, losses)
