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


def _read_merged_dets(work_dir, epoch, scene="SP001"):
    """Parse the after_nms per-class txts into
    {cls_id: [(score, cx, cy), ...]}."""
    from rs_detection_tpu.config.constant import DOTA1_CLASSES

    merged_dir = os.path.join(work_dir,
                              f"test/submit_{epoch}/after_nms")
    dets = {}
    for cls_id in (1, 2):
        path = os.path.join(merged_dir,
                            DOTA1_CLASSES[cls_id - 1] + ".txt")
        if not os.path.exists(path):
            continue
        for line in open(path):
            f = line.split()
            if f[0] != scene:
                continue
            poly = np.asarray([float(v) for v in f[2:10]])
            dets.setdefault(cls_id, []).append(
                (float(f[1]), poly[0::2].mean(), poly[1::2].mean()))
    return dets


def _match_count(dets, infos, offsets, min_score=0.1):
    matched = total = 0
    for i, info in enumerate(infos):
        ox, oy = offsets[i]
        for box, lab in zip(info["ann"]["bboxes"],
                            info["ann"]["labels"]):
            total += 1
            gx, gy = box[0] + ox, box[1] + oy
            ok = any(abs(cx - gx) < 24 and abs(cy - gy) < 24
                     and s >= min_score
                     for s, cx, cy in dets.get(int(lab), []))
            matched += bool(ok)
    return matched, total


@pytest.mark.slow
def test_screened_scene_serving_end_to_end_map(tmp_path, monkeypatch):
    """Sparse-scene screening proven on the FINAL metric (VERDICT-r4
    #2): screen -> Runner.test -> tile-merge -> scene detections. A
    sparse 3x3 scene (4 occupied tiles, 5 background) is served three
    ways with the same trained detector:

    * dense (no screen)      — the baseline detections;
    * screened (thresh 0.5)  — must keep only the occupied tiles AND
      reproduce the dense detections exactly (a screen false-negative
      silently deletes every detection in its tile — only this merged
      comparison catches that);
    * budget=1 (deliberately too tight) — must LOSE ground-truth
      matches, proving the harness detects the degradation mode
      rather than passing vacuously.
    """
    import pickle as pkl
    import shutil

    import jax
    import jax.numpy as jnp
    import optax
    from flax import serialization

    import rs_detection_tpu.data  # noqa: F401
    import rs_detection_tpu.models  # noqa: F401
    from rs_detection_tpu.config import get_cfg
    from rs_detection_tpu.data.scene import SceneDataset
    from rs_detection_tpu.models.networks.tile_screen import (
        TileScreen, screen_loss)
    from rs_detection_tpu.runner.runner import Runner
    from test_runner import _tiny_cfg

    monkeypatch.chdir(tmp_path)
    ds_dir = render_dataset(str(tmp_path / "ds"))

    # ---- compose the sparse 384^2 scene: rendered tiles fill the
    # top-left 2x2 quadrant; the other 5 tiles are background
    rng = np.random.RandomState(33)
    scene_img = np.full((384, 384, 3), 60, np.uint8)
    scene_img += (rng.rand(384, 384, 3) * 20).astype(np.uint8)
    offsets = {0: (0, 0), 1: (128, 0), 2: (0, 128), 3: (128, 128)}
    for i, (ox, oy) in offsets.items():
        tile = np.asarray(Image.open(
            os.path.join(ds_dir, "images", f"tile_{i}.png")))
        scene_img[oy:oy + 128, ox:ox + 128] = tile
    scene_dir = tmp_path / "scenes"
    scene_dir.mkdir()
    Image.fromarray(scene_img).save(scene_dir / "SP001.png")

    # ---- train the detector (same recipe as the dense-map test)
    cfg = get_cfg()
    cfg.clear()
    c = _tiny_cfg(ds_dir, str(tmp_path / "w"), max_iter=None)
    c["max_epoch"] = 200
    c["optimizer"]["lr"] = 0.001
    c["scheduler"] = dict(type="StepLR", warmup="linear",
                          warmup_iters=10, warmup_ratio=0.1,
                          milestones=[150])
    c["merge_cfg"] = dict(dataset_type="DOTA")
    # Runner.test only runs the tile-merge when cfg.dataset.test is
    # set; serve() below swaps runner.test_dataset per screen config
    c["dataset"]["test"] = dict(
        type="SceneDataset", images_dir=str(scene_dir), subsize=128,
        gap=0, batch_size=2)
    c["eval_interval"] = 9999
    c["checkpoint_interval"] = 9999
    c["log_interval"] = 10000
    cfg.update(c)
    runner = Runner()
    for _ in range(200):
        runner.train()

    # ---- train the tile screen in-process on the scene's own 9
    # normalized tiles (label = tile intersects any GT) — the
    # tools/train_screen.py recipe at test scale
    mean = np.array([123.675, 116.28, 103.53], np.float32)
    std = np.array([58.395, 57.12, 57.375], np.float32)
    tiles9 = np.stack([
        (scene_img[u:u + 128, l:l + 128].astype(np.float32) - mean)
        / std
        for u in (0, 128, 256) for l in (0, 128, 256)])
    labels9 = jnp.asarray(
        [1.0, 1.0, 0.0, 1.0, 1.0, 0.0, 0.0, 0.0, 0.0])
    screen = TileScreen(channels=(8, 16), pool=4)
    svars = screen.init(jax.random.PRNGKey(0), tiles9[:1])
    tx = optax.adam(3e-3)
    opt = tx.init(svars["params"])

    @jax.jit
    def screen_step(p, o):
        def lf(pp):
            out = screen_loss(
                screen.apply({"params": pp}, jnp.asarray(tiles9)),
                labels9)
            return out[0] if isinstance(out, tuple) else out
        l, g = jax.value_and_grad(lf)(p)
        up, o2 = tx.update(g, o, p)
        return optax.apply_updates(p, up), o2, l

    params_s = svars["params"]
    for _ in range(150):
        params_s, opt, sl = screen_step(params_s, opt)
    # the screen must separate the training tiles before we rely on it
    logits = np.asarray(screen.apply({"params": params_s},
                                     jnp.asarray(tiles9)))
    assert (logits[np.asarray(labels9) > 0.5].min()
            > logits[np.asarray(labels9) < 0.5].max()), logits
    ckpt_path = str(tmp_path / "screen.pkl")
    with open(ckpt_path, "wb") as f:
        pkl.dump({"model": serialization.to_state_dict(
            {"params": params_s})}, f)

    # ---- serve the scene three ways through the identical pipeline
    screen_model = dict(type="TileScreen", channels=(8, 16), pool=4)

    def serve(screen_cfg):
        sub = os.path.join(str(tmp_path / "w"),
                           f"test/submit_{runner.epoch}")
        if os.path.exists(sub):
            shutil.rmtree(sub)
        ds = SceneDataset(images_dir=str(scene_dir), subsize=128,
                          gap=0, batch_size=2, screen=screen_cfg)
        runner.test_dataset = ds
        runner.test(flip_test=False)
        return (_read_merged_dets(str(tmp_path / "w"), runner.epoch),
                dict(ds.screen_stats))

    dense_dets, _ = serve(None)
    with open(os.path.join(ds_dir, "labels.pkl"), "rb") as fh:
        infos = pkl.load(fh)
    m_dense, total = _match_count(dense_dets, infos, offsets)
    assert m_dense >= total * 0.4, (m_dense, total, dense_dets)

    scr_dets, scr_stats = serve(dict(model=screen_model,
                                     checkpoint=ckpt_path,
                                     thresh=0.5))
    # the screen actually removed work (the 5 background tiles)...
    assert scr_stats["total"] == 9 and scr_stats["kept"] == 4, \
        scr_stats
    # ...and above a score floor the merged detections are IDENTICAL
    # to the dense run (the dense run additionally carries ~0.06-score
    # false positives on the 5 background tiles — removing those is
    # the point of screening, so the exact comparison applies to the
    # confident set; real dets here score 0.88+)
    def confident(dets, floor=0.3):
        return {c: sorted(v for v in d if v[0] >= floor)
                for c, d in dets.items()
                if any(v[0] >= floor for v in d)}

    a_all, b_all = confident(dense_dets), confident(scr_dets)
    assert set(a_all) == set(b_all), (a_all, b_all)
    for cls_id in a_all:
        a, b = a_all[cls_id], b_all[cls_id]
        assert len(a) == len(b), (cls_id, a, b)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-4)
    # same ground-truth recovery as dense
    m_scr, _ = _match_count(scr_dets, infos, offsets)
    assert m_scr == m_dense, (m_scr, m_dense)

    # ---- degradation mode: budget=1 keeps one tile per scene, so
    # most GTs lose their detections — the harness can fail
    tight_dets, tight_stats = serve(dict(model=screen_model,
                                         checkpoint=ckpt_path,
                                         budget=1))
    assert tight_stats["kept"] == 1, tight_stats
    m_tight, _ = _match_count(tight_dets, infos, offsets)
    assert m_tight < m_dense, (m_tight, m_dense)
    assert m_tight <= total * 0.5, (m_tight, total)
