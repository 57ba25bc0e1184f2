"""Runner engine smoke test: config-driven build, 2 train steps,
checkpoint save/resume, val — on a synthetic tiled dataset."""

import os
import pickle

import numpy as np
import pytest
from PIL import Image


def make_dataset(root, n=4, size=128):
    os.makedirs(os.path.join(root, "images"), exist_ok=True)
    rng = np.random.RandomState(0)
    infos = []
    for i in range(n):
        name = f"tile_{i}.png"
        img = (rng.rand(size, size, 3) * 255).astype(np.uint8)
        Image.fromarray(img).save(os.path.join(root, "images", name))
        boxes = np.array([[40 + i, 40, 30, 14, 0.3],
                          [80, 70 + i, 20, 10, -0.4]], np.float32)
        infos.append(dict(
            filename=name, width=size, height=size,
            ann=dict(bboxes=boxes,
                     labels=np.array([1, 2], np.int64),
                     bboxes_ignore=np.zeros((0, 5), np.float32),
                     labels_ignore=np.zeros((0,), np.int64))))
    with open(os.path.join(root, "labels.pkl"), "wb") as f:
        pickle.dump(infos, f)
    return root


@pytest.mark.slow
def test_runner_end_to_end(tmp_path):
    import rs_detection_tpu.data  # noqa: F401
    import rs_detection_tpu.models  # noqa: F401
    from rs_detection_tpu.config import get_cfg
    from rs_detection_tpu.runner.runner import Runner

    ds_dir = make_dataset(str(tmp_path / "ds"))
    work_dir = str(tmp_path / "work")

    cfg = get_cfg()
    cfg.clear()
    cfg.update(dict(
        name="runner_smoke",
        work_dir=work_dir,
        max_epoch=1,
        max_iter=2,
        log_interval=1,
        checkpoint_interval=1,
        model=dict(
            type="OrientedRCNN",
            backbone=dict(type="Resnet18", norm_eval=False),
            neck=dict(type="FPN", in_channels=[64, 128, 256, 512],
                      out_channels=32, num_outs=5),
            rpn=dict(type="OrientedRPNHead", in_channels=32,
                     feat_channels=32, nms_pre=64, nms_post=32,
                     pre_nms_cap=128,
                     sampler=dict(type="RandomSampler", num=32,
                                  pos_fraction=0.5)),
            bbox_head=dict(
                type="OrientedHead", num_classes=15, in_channels=32,
                fc_out_channels=64,
                sampler=dict(type="RandomSamplerRotated", num=16,
                             pos_fraction=0.25),
                bbox_roi_extractor=dict(
                    type="OrientedSingleRoIExtractor",
                    roi_layer=dict(type="ROIAlignRotated_v1",
                                   output_size=7, sampling_ratio=2),
                    out_channels=32, extend_factor=(1.4, 1.2),
                    featmap_strides=[4, 8, 16, 32]))),
        dataset=dict(
            train=dict(type="DOTADataset", dataset_dir=ds_dir,
                       batch_size=2, max_gt=8, shuffle=True,
                       filter_empty_gt=False,
                       transforms=[
                           dict(type="RotatedResize", min_size=128,
                                max_size=128),
                           dict(type="Normalize",
                                mean=[123.675, 116.28, 103.53],
                                std=[58.395, 57.12, 57.375],
                                to_bgr=False)]),
            val=dict(type="DOTADataset", dataset_dir=ds_dir,
                     batch_size=2, max_gt=8,
                     transforms=[
                         dict(type="RotatedResize", min_size=128,
                              max_size=128),
                         dict(type="Normalize",
                              mean=[123.675, 116.28, 103.53],
                              std=[58.395, 57.12, 57.375],
                              to_bgr=False)])),
        optimizer=dict(type="SGD", lr=0.001, momentum=0.9,
                       grad_clip=dict(max_norm=35)),
        scheduler=dict(type="StepLR", warmup="linear", warmup_iters=2,
                       warmup_ratio=0.33, milestones=[8]),
    ))

    runner = Runner()
    runner.run()
    assert runner.iter == 2
    ckpts = os.listdir(os.path.join(work_dir, "checkpoints"))
    assert any(c.startswith("ckpt_") for c in ckpts)

    # resume from the checkpoint
    runner2 = Runner()
    assert runner2.iter == 2

    # val path produces an AP dict
    aps = runner.val()
    assert "eval/0_meanAP" in aps

    # orbax save/load round-trip
    import jax
    import numpy as np

    runner.cfg.use_orbax = True
    opath = runner.save()
    before = jax.tree_util.tree_leaves(runner._variables())[0]
    runner.load(opath)
    runner._apply_pending() if hasattr(runner, "_apply_pending") else None
    restored = runner._pending_variables
    leaf = jax.tree_util.tree_leaves(restored)[0]
    np.testing.assert_allclose(np.asarray(leaf), np.asarray(before))


@pytest.mark.slow
def test_runner_test_task_submission(tmp_path, monkeypatch):
    """--task test end-to-end: tile inference -> per-class txts ->
    tile-merge poly NMS -> DOTA submission zip."""
    import numpy as np
    from PIL import Image

    import rs_detection_tpu.data  # noqa: F401
    import rs_detection_tpu.models  # noqa: F401
    from rs_detection_tpu.config import get_cfg
    from rs_detection_tpu.runner.runner import Runner

    monkeypatch.chdir(tmp_path)  # submit_zips/ is cwd-relative
    ds_dir = make_dataset(str(tmp_path / "ds"))
    tiles = tmp_path / "tiles" / "images"
    tiles.mkdir(parents=True)
    rng = np.random.RandomState(1)
    for name in ("P0001__1.0__0___0.png", "P0001__1.0__96___0.png"):
        Image.fromarray((rng.rand(128, 128, 3) * 255).astype(
            np.uint8)).save(tiles / name)

    cfg = get_cfg()
    cfg.clear()
    cfg.update(dict(
        name="runner_test_smoke",
        work_dir=str(tmp_path / "work"),
        max_epoch=1, max_iter=1, log_interval=1,
        checkpoint_interval=10,
        merge_cfg=dict(dataset_type="DOTA"),
        model=dict(
            type="OrientedRCNN",
            backbone=dict(type="Resnet18", norm_eval=False),
            neck=dict(type="FPN", in_channels=[64, 128, 256, 512],
                      out_channels=32, num_outs=5),
            rpn=dict(type="OrientedRPNHead", in_channels=32,
                     feat_channels=32, nms_pre=64, nms_post=32,
                     pre_nms_cap=128,
                     sampler=dict(type="RandomSampler", num=32,
                                  pos_fraction=0.5)),
            bbox_head=dict(
                type="OrientedHead", num_classes=15, in_channels=32,
                fc_out_channels=64,
                sampler=dict(type="RandomSamplerRotated", num=16,
                             pos_fraction=0.25),
                bbox_roi_extractor=dict(
                    type="OrientedSingleRoIExtractor",
                    roi_layer=dict(type="ROIAlignRotated_v1",
                                   output_size=7, sampling_ratio=2),
                    out_channels=32, extend_factor=(1.4, 1.2),
                    featmap_strides=[4, 8, 16, 32]))),
        dataset=dict(
            train=dict(type="DOTADataset", dataset_dir=ds_dir,
                       batch_size=2, max_gt=8,
                       transforms=[
                           dict(type="RotatedResize", min_size=128,
                                max_size=128),
                           dict(type="Normalize",
                                mean=[123.675, 116.28, 103.53],
                                std=[58.395, 57.12, 57.375],
                                to_bgr=False)]),
            test=dict(type="ImageDataset",
                      images_dir=str(tiles),
                      dataset_type="DOTA", batch_size=2,
                      transforms=[
                          dict(type="RotatedResize", min_size=128,
                               max_size=128),
                          dict(type="Normalize",
                               mean=[123.675, 116.28, 103.53],
                               std=[58.395, 57.12, 57.375],
                               to_bgr=False)])),
        optimizer=dict(type="SGD", lr=0.001, momentum=0.9),
        scheduler=dict(type="StepLR", milestones=[8]),
    ))

    runner = Runner()
    runner.test(flip_test=True)
    # pickle written
    assert os.path.exists(os.path.join(
        cfg.work_dir, "test", "test_0.pkl"))
    # submission zip assembled
    assert os.path.exists(os.path.join("submit_zips",
                                       "runner_test_smoke.zip"))
