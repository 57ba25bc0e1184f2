"""Full-pipeline mAP evidence: a detector trained through the Runner on
rendered tiles must actually detect (AP through the real eval
protocol), not merely reduce its loss.

This is the closest available analogue of the reference's published
mAP numbers (no labeled aerial data ships in this environment): tiles
with VISIBLE rotated rectangles (distinct color per class) are written
to disk, the tiny Oriented R-CNN flagship trains on them through the
full Runner path (dataset -> transforms -> collate -> DP train step),
and ``Runner.val()`` must report per-class AP >= 0.3 through the
in-memory VOC evaluator (polygon IoU, continuous AP). A model with any
systematic geometry defect (anchor layout, coder, proposal indexing,
angle conventions, NMS) cannot pass — the oracle-consistency tests in
test_eval_protocol.py validate the protocol, this validates the model.
"""

import math
import os
import pickle

import numpy as np
import pytest
from PIL import Image


def render_dataset(root, n=4, size=128, seed=0):
    """Tiles with visible rotated rectangles; class 1 red, class 2
    cyan."""
    os.makedirs(os.path.join(root, "images"), exist_ok=True)
    rng = np.random.RandomState(seed)
    infos = []
    for i in range(n):
        img = np.full((size, size, 3), 60, np.uint8)
        img += (rng.rand(size, size, 3) * 20).astype(np.uint8)
        boxes, labels = [], []
        for b in range(3):
            cx, cy = rng.uniform(25, size - 25, 2)
            w, h = rng.uniform(24, 40), rng.uniform(10, 18)
            th = rng.uniform(-1.2, 1.2)
            cls = 1 + (b % 2)
            color = (230, 60, 40) if cls == 1 else (40, 200, 230)
            yy, xx = np.mgrid[0:size, 0:size]
            dx, dy = xx - cx, yy - cy
            u = dx * math.cos(th) + dy * math.sin(th)
            v = -dx * math.sin(th) + dy * math.cos(th)
            img[(np.abs(u) < w / 2) & (np.abs(v) < h / 2)] = color
            boxes.append([cx, cy, w, h, th])
            labels.append(cls)
        name = f"tile_{i}.png"
        Image.fromarray(img).save(os.path.join(root, "images", name))
        infos.append(dict(
            filename=name, width=size, height=size,
            ann=dict(bboxes=np.asarray(boxes, np.float32),
                     labels=np.asarray(labels, np.int64),
                     bboxes_ignore=np.zeros((0, 5), np.float32),
                     labels_ignore=np.zeros((0,), np.int64))))
    with open(os.path.join(root, "labels.pkl"), "wb") as f:
        pickle.dump(infos, f)
    return root


@pytest.mark.slow
def test_orcnn_overfits_to_real_detections(tmp_path, monkeypatch):
    """Train-to-detect on rendered tiles, then close the FULL loop:
    the same trained model runs the Runner.test tile pipeline over the
    tiles re-cast as splits of one big scene, and the MERGED
    scene-coordinate detections (result_merge poly-NMS + offset
    re-application) must land on the scene ground truth — the
    submission path the reference exercises on DOTA."""
    import shutil

    import rs_detection_tpu.data  # noqa: F401
    import rs_detection_tpu.models  # noqa: F401
    from rs_detection_tpu.config import get_cfg
    from rs_detection_tpu.runner.runner import Runner
    from test_runner import _tiny_cfg

    monkeypatch.chdir(tmp_path)  # submit_zips/ is cwd-relative
    ds_dir = render_dataset(str(tmp_path / "ds"))

    # scene tiles: the 4 training tiles become the 2x2 split grid of
    # scene S0001 (DOTA split naming: <scene>__<scale>__<x>___<y>)
    tiles = tmp_path / "tiles" / "images"
    tiles.mkdir(parents=True)
    offsets = {0: (0, 0), 1: (128, 0), 2: (0, 128), 3: (128, 128)}
    for i, (ox, oy) in offsets.items():
        shutil.copy(os.path.join(ds_dir, "images", f"tile_{i}.png"),
                    tiles / f"S0001__1.0__{ox}___{oy}.png")

    cfg = get_cfg()
    cfg.clear()
    c = _tiny_cfg(ds_dir, str(tmp_path / "w"), max_iter=None)
    c["max_epoch"] = 200                       # 2 iters/epoch
    # lr above ~2e-3 diverges on this tiny 32-channel net (measured:
    # 5e-3 -> proposals never localize; 1e-3 -> AP ~0.7 in 300 iters)
    c["optimizer"]["lr"] = 0.001
    c["scheduler"] = dict(type="StepLR", warmup="linear",
                          warmup_iters=10, warmup_ratio=0.1,
                          milestones=[150])
    c["dataset"]["val"] = dict(c["dataset"]["train"])
    c["dataset"]["test"] = dict(
        type="ImageDataset", images_dir=str(tiles),
        dataset_type="DOTA", batch_size=2,
        transforms=list(c["dataset"]["train"]["transforms"]))
    c["merge_cfg"] = dict(dataset_type="DOTA")
    c["eval_interval"] = 9999
    c["checkpoint_interval"] = 9999
    c["log_interval"] = 10000
    cfg.update(c)

    runner = Runner()
    for _ in range(200):
        runner.train()
    aps = runner.val()

    present = [k for k in aps
               if k.startswith("eval/1_") or k.startswith("eval/2_")]
    assert len(present) == 2
    for k in present:
        assert aps[k] >= 0.3, (k, aps[k], aps["eval/0_meanAP"])

    # ---- scene phase: tile inference -> merge -> scene-level match
    from rs_detection_tpu.config.constant import DOTA1_CLASSES

    runner.test(flip_test=False)
    merged_dir = os.path.join(
        str(tmp_path / "w"), f"test/submit_{runner.epoch}/after_nms")
    dets = {}                                  # cls_id -> [(score, cx, cy)]
    for cls_id in (1, 2):
        path = os.path.join(merged_dir,
                            DOTA1_CLASSES[cls_id - 1] + ".txt")
        if not os.path.exists(path):
            continue
        for line in open(path):
            f = line.split()
            if f[0] != "S0001":
                continue
            poly = np.asarray([float(v) for v in f[2:10]])
            dets.setdefault(cls_id, []).append(
                (float(f[1]), poly[0::2].mean(), poly[1::2].mean()))

    # scene gt = tile gt + tile offsets
    with open(os.path.join(ds_dir, "labels.pkl"), "rb") as fh:
        infos = pickle.load(fh)
    matched = total = 0
    for i, info in enumerate(infos):
        ox, oy = offsets[i]
        for box, lab in zip(info["ann"]["bboxes"],
                            info["ann"]["labels"]):
            total += 1
            gx, gy = box[0] + ox, box[1] + oy
            ok = any(abs(cx - gx) < 24 and abs(cy - gy) < 24
                     and s >= 0.1
                     for s, cx, cy in dets.get(int(lab), []))
            matched += bool(ok)
    # per-class tile AP >= 0.3 implies a healthy share of scene GTs
    # must be recovered once tile offsets are re-applied by the merge;
    # a coordinate/merge bug (lost offsets, un-flip errors, NMS
    # collapse) drops this to ~0
    assert matched >= total * 0.4, (matched, total, dets)
