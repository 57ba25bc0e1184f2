"""Regression pins for the round-3 code-review fixes."""

import os
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def test_int8_disabled_in_training_rpn(monkeypatch):
    """RS_INT8=1 must not quantize the RPN tower conv in train mode:
    the int8 round/clip has zero gradient, which would silently stop
    rpn_conv updates."""
    monkeypatch.setenv("RS_INT8", "1")
    from rs_detection_tpu.models.roi_heads.oriented_rpn_head import \
        OrientedRPNHead

    head = OrientedRPNHead(in_channels=8, feat_channels=8,
                           anchor_generator=dict(
                               scales=[8], ratios=[1.0], strides=[4]))
    feats = [jnp.asarray(np.random.RandomState(0)
                         .randn(1, 8, 8, 8).astype(np.float32))]
    variables = head.init(jax.random.PRNGKey(0), feats, train=True)

    def loss(v, train):
        cls, reg = head.apply(v, feats, train=train)
        return sum(jnp.sum(c ** 2) for c in cls) \
            + sum(jnp.sum(r ** 2) for r in reg)

    g_train = jax.grad(lambda v: loss(v, True))(variables)
    gk = g_train["params"]["rpn_conv"]["kernel"]
    assert float(jnp.max(jnp.abs(gk))) > 0.0


def test_pretrained_string_is_loud_or_loaded(tmp_path):
    from rs_detection_tpu.runner.runner import Runner

    cfg = types.SimpleNamespace(
        model={"backbone": {"type": "Resnet50",
                            "pretrained": "modelzoo://resnet50"}},
        allow_random_init=False)
    dummy = types.SimpleNamespace(cfg=cfg)
    with pytest.raises(RuntimeError, match="modelzoo"):
        Runner._check_pretrained_request(dummy)

    # a real local file path loads instead of raising
    p = tmp_path / "conv.pkl"
    p.write_bytes(b"x")
    loaded = []
    cfg2 = types.SimpleNamespace(
        model={"backbone": {"type": "Resnet50",
                            "pretrained": str(p)}},
        allow_random_init=False)
    dummy2 = types.SimpleNamespace(
        cfg=cfg2, load=lambda path, model_only: loaded.append(path))
    Runner._check_pretrained_request(dummy2)
    assert loaded == [str(p)]


def test_freeze_prefix_stage_alias_and_zero_match():
    from rs_detection_tpu.models.param_generators import _prefix_mask

    params = {"backbone": {
        "Conv_0": {"kernel": np.zeros((7, 7, 3, 64))},
        "Norm_0": {"scale": np.zeros((64,))},
        "layer1_0": {"Conv_0": {"kernel": np.zeros((3, 3, 64, 64))}},
    }, "neck": {"Conv_0": {"kernel": np.zeros((1, 1, 64, 32))}}}

    m = _prefix_mask(params, ["backbone.C1"])
    assert m["backbone"]["Conv_0"]["kernel"] is True
    assert m["backbone"]["Norm_0"]["scale"] is True
    assert m["backbone"]["layer1_0"]["Conv_0"]["kernel"] is False
    assert m["neck"]["Conv_0"]["kernel"] is False

    m2 = _prefix_mask(params, ["backbone.C2"])
    assert m2["backbone"]["layer1_0"]["Conv_0"]["kernel"] is True
    assert m2["backbone"]["Conv_0"]["kernel"] is False

    with pytest.raises(ValueError, match="matched NO parameters"):
        _prefix_mask(params, ["backbone.does_not_exist"])


def test_cosine_group_requires_max_steps():
    from rs_detection_tpu.optims.lr_scheduler import \
        CosineAnnealingLRGroup

    with pytest.raises(TypeError, match="max_steps"):
        CosineAnnealingLRGroup()
    s = CosineAnnealingLRGroup(max_epoch=12)     # reference form
    lr_mid = float(s(1.0, 0, 6))
    lr_end = float(s(1.0, 0, 12))
    assert lr_end < lr_mid < 1.0                 # real cosine decay


def test_scene_targets_fresh_per_batch(tmp_path):
    from PIL import Image

    from rs_detection_tpu.data.scene import SceneDataset

    rng = np.random.RandomState(0)
    d = tmp_path / "s"
    d.mkdir()
    Image.fromarray((rng.rand(112, 112, 3) * 255)
                    .astype(np.uint8)).save(d / "A.png")
    sds = SceneDataset(images_dir=str(d), subsize=64, gap=16,
                       batch_size=2)
    seen = []
    for _, targets, _ in sds.batches():
        targets["marker"] = True       # consumer mutation
        seen.append(targets)
    assert len(seen) >= 2
    assert seen[0] is not seen[1]
