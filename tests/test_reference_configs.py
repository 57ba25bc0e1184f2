"""The "configs runnable verbatim" contract (BASELINE.json): every
config file shipped by the reference repo must load through this
framework's config system and build its model through the registry —
and one representative config per network type must run a real tiny
loss + predict step.

Reference config surface: ``/root/reference/configs/**/*.py`` and
``/root/reference/projects/*/configs/*.py`` (SURVEY §2.6). The same
surface is shipped IN-REPO (``tests/test_config_zoo.py``), so the
sweep here over the mounted reference is a secondary cross-check; the
run-a-step representatives below use the in-repo copies and need no
mount.
"""

import glob
import os

import numpy as np
import pytest

REF = "/root/reference"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _reference_configs():
    cfgs = sorted(
        glob.glob(os.path.join(REF, "configs", "**", "*.py"),
                  recursive=True)
        + glob.glob(os.path.join(REF, "projects", "*", "configs", "*.py")))
    # preprocess configs describe the tiler, not a model
    return [c for c in cfgs if "preprocess" not in c]


CONFIGS = _reference_configs()


@pytest.mark.skipif(not CONFIGS, reason="reference repo not present")
@pytest.mark.parametrize(
    "path", CONFIGS, ids=[os.path.basename(p) for p in CONFIGS])
def test_reference_config_builds_model(path):
    import rs_detection_tpu.data  # noqa: F401  (populate registries)
    import rs_detection_tpu.models  # noqa: F401
    from rs_detection_tpu.config.config import Config
    from rs_detection_tpu.utils.registry import MODELS, build_from_cfg

    cfg = Config(path)
    if cfg.model is None or (isinstance(cfg.model, dict)
                             and "type" not in cfg.model):
        # base fragments (e.g. yolo_{dataset,optimizer,scheduler}_base)
        # carry no complete model section — loading them is the contract
        assert os.path.basename(path).endswith("_base.py"), \
            f"{path}: no model section"
        return
    model = build_from_cfg(cfg.model, MODELS)
    assert model is not None, path


# one representative reference config per network family for the
# build-AND-run check (tiny images keep the CPU cost bounded; the
# models themselves are the full configured architectures)
RUN_CONFIGS = [
    ("configs/orcnn_van3_7_anchor_swa_1.py", "OrientedRCNN"),
    ("projects/s2anet/configs/s2anet_r50_fpn_1x_dota.py", "S2ANet"),
    ("projects/retinanet/configs/retinanet_r50v1d_fpn_dota.py",
     "RetinaNet"),
    ("projects/fcos/configs/fcos_obb_r50_fpn_1x_dota.py", "FCOS"),
    ("projects/gliding/configs/gliding_r50_fpn_1x_dota_with_flip.py",
     "GlidingVertex"),
    ("projects/roi_transformer/configs/"
     "faster_rcnn_RoITrans_r101_fpn_1x_dota.py", None),
    ("projects/faster_rcnn/configs/faster_rcnn_obb_r50_fpn_1x_dota.py",
     None),
    ("projects/r3det/configs/r3det_r50_fpn_1x_dota.py", "R3Det"),
]


@pytest.mark.slow
@pytest.mark.parametrize(
    "rel,expect_type", RUN_CONFIGS,
    ids=[os.path.basename(r) for r, _ in RUN_CONFIGS])
def test_reference_config_runs_loss_and_predict(rel, expect_type):
    import jax
    import jax.numpy as jnp

    import rs_detection_tpu.data  # noqa: F401
    import rs_detection_tpu.models  # noqa: F401
    from rs_detection_tpu.config.config import Config
    from rs_detection_tpu.utils.registry import MODELS, build_from_cfg

    # in-repo zoo copies of the reference configs (same relative path)
    path = os.path.join(REPO, rel)
    cfg = Config(path)
    model = build_from_cfg(cfg.model, MODELS)
    if expect_type is not None:
        assert type(model).__name__ == expect_type, type(model).__name__

    img = 128
    b = 1
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.rand(b, img, img, 3).astype(np.float32))
    from rs_detection_tpu.ops.box_ops import rotated_box_to_bbox_np

    rboxes = np.zeros((b, 4, 5), np.float32)
    rboxes[0, 0] = [40, 40, 30, 14, 0.3]
    rboxes[0, 1] = [90, 70, 20, 10, -0.5]
    gt_mask = np.zeros((b, 4), bool)
    gt_mask[0, :2] = True
    labels = np.zeros((b, 4), np.int32)
    labels[0, :2] = [1, 2]
    hboxes, polys = rotated_box_to_bbox_np(rboxes.reshape(-1, 5))
    targets = dict(
        rboxes=jnp.asarray(rboxes), gt_mask=jnp.asarray(gt_mask),
        labels=jnp.asarray(labels),
        hboxes=jnp.asarray(hboxes.reshape(b, 4, 4).astype(np.float32)),
        polys=jnp.asarray(polys.reshape(b, 4, 8).astype(np.float32)),
        img_hw=jnp.asarray([[img, img]] * b, jnp.float32),
        scale_factor=jnp.ones((b,), np.float32))

    variables = model.init(
        {"params": jax.random.PRNGKey(0),
         "sampler": jax.random.PRNGKey(1)}, images, targets)
    losses = model.apply(variables, images, targets, method=model.loss,
                         rngs={"sampler": jax.random.PRNGKey(2)},
                         mutable=True)
    if isinstance(losses, tuple):
        losses = losses[0]
    total = sum(float(v) for k, v in losses.items() if "loss" in k)
    assert np.isfinite(total), losses

    out = model.apply(variables, images, targets, method=model.predict)
    assert "polys" in out and np.all(np.isfinite(np.asarray(out["polys"])))
