"""Eval-protocol validation with an oracle detector.

The mAP number is only as trustworthy as the protocol computing it:
feed the in-memory evaluator (``DOTADataset.evaluate`` ->
``voc_eval_dota`` with exact polygon IoU, the reference's
``data/dota.py:85-143`` protocol) detections derived directly from the
ground truth and require AP == 1.0 per present class; then degrade the
detections in controlled ways and require the expected AP response
(misses halve recall; duplicates are FPs but rank below first matches;
difficult GTs neither count nor hurt).
"""

import numpy as np
import pytest


def _mk_dataset(tmp_path=None):
    import os
    import pickle
    import tempfile

    import rs_detection_tpu.data  # noqa: F401
    from rs_detection_tpu.utils.registry import DATASETS

    root = str(tmp_path or tempfile.mkdtemp())
    os.makedirs(os.path.join(root, "images"), exist_ok=True)
    with open(os.path.join(root, "labels.pkl"), "wb") as f:
        pickle.dump([dict(filename="x.png", width=8, height=8,
                          ann=dict(bboxes=np.zeros((1, 5), np.float32),
                                   labels=np.ones(1, np.int64)))], f)
    return DATASETS.get("DOTADataset")(dataset_dir=root)


def _poly(cx, cy, w, h):
    x1, y1 = cx - w / 2, cy - h / 2
    x2, y2 = cx + w / 2, cy + h / 2
    return [x1, y1, x2, y1, x2, y2, x1, y2]


def _targets(n_img=4, boxes_per_img=3):
    rng = np.random.RandomState(0)
    targets = []
    for i in range(n_img):
        polys, labels = [], []
        for b in range(boxes_per_img):
            cx, cy = rng.uniform(100, 900, 2)
            w, h = rng.uniform(30, 80, 2)
            polys.append(_poly(cx, cy, w, h))
            labels.append(1 + (b % 2))       # classes 1 and 2
        targets.append(dict(polys=np.asarray(polys, np.float64),
                            labels=np.asarray(labels, np.float64),
                            scale_factor=1.0))
    return targets


class TestOracleEval:
    def test_perfect_detections_ap_1(self, tmp_path):
        ds = _mk_dataset()
        results = []
        for t in _targets():
            dets = (t["polys"].copy(),
                    np.ones(len(t["labels"])),
                    t["labels"].astype(np.int64))
            results.append((dets, t))
        aps = ds.evaluate(results, str(tmp_path), 0)
        for c_idx in (1, 2):
            key = [k for k in aps if k.startswith(f"eval/{c_idx}_")][0]
            assert aps[key] == pytest.approx(1.0, abs=1e-6), (key, aps)

    def test_half_missed_halves_recall(self, tmp_path):
        ds = _mk_dataset()
        results = []
        for i, t in enumerate(_targets(n_img=4, boxes_per_img=2)):
            if i % 2 == 0:
                dets = (t["polys"].copy(), np.ones(2),
                        t["labels"].astype(np.int64))
            else:
                dets = (np.zeros((0, 8)), np.zeros(0),
                        np.zeros(0, np.int64))
            results.append((dets, t))
        aps = ds.evaluate(results, str(tmp_path), 0)
        for c_idx in (1, 2):
            key = [k for k in aps if k.startswith(f"eval/{c_idx}_")][0]
            # all detections are correct (precision 1) but recall tops
            # out at 0.5 -> continuous AP == 0.5
            assert aps[key] == pytest.approx(0.5, abs=1e-6), (key, aps)

    def test_duplicates_are_fps(self, tmp_path):
        ds = _mk_dataset()
        results = []
        for t in _targets(n_img=2, boxes_per_img=2):
            polys = np.concatenate([t["polys"], t["polys"]])
            # duplicates score lower -> ranked after the true matches
            scores = np.concatenate([np.ones(2), np.full(2, 0.5)])
            labels = np.concatenate([t["labels"], t["labels"]])
            results.append(((polys, scores, labels.astype(np.int64)), t))
        aps = ds.evaluate(results, str(tmp_path), 0)
        for c_idx in (1, 2):
            key = [k for k in aps if k.startswith(f"eval/{c_idx}_")][0]
            # recall reaches 1.0 before any duplicate FP appears ->
            # AP still 1.0 (VOC continuous with max-precision envelope)
            assert aps[key] == pytest.approx(1.0, abs=1e-6), (key, aps)

    def test_difficult_gts_ignored(self, tmp_path):
        ds = _mk_dataset()
        results = []
        for t in _targets(n_img=2, boxes_per_img=2):
            # mark an extra ignore poly; detect it too — matching a
            # difficult GT must neither count as TP nor as FP
            t = dict(t, polys_ignore=np.asarray(
                [_poly(500, 500, 40, 40)], np.float64))
            polys = np.concatenate(
                [t["polys"], np.asarray([_poly(500, 500, 40, 40)])])
            scores = np.array([1.0, 1.0, 0.9])
            labels = np.concatenate([t["labels"], [1]])
            results.append(((polys, scores, labels.astype(np.int64)), t))
        aps = ds.evaluate(results, str(tmp_path), 0)
        for c_idx in (1, 2):
            key = [k for k in aps if k.startswith(f"eval/{c_idx}_")][0]
            assert aps[key] == pytest.approx(1.0, abs=1e-6), (key, aps)

    def test_localization_error_is_fp(self, tmp_path):
        ds = _mk_dataset()
        results = []
        for t in _targets(n_img=2, boxes_per_img=2):
            polys = t["polys"] + 100.0  # shifted: IoU ~ 0 -> all FP
            results.append(((polys, np.ones(2),
                             t["labels"].astype(np.int64)), t))
        aps = ds.evaluate(results, str(tmp_path), 0)
        for c_idx in (1, 2):
            key = [k for k in aps if k.startswith(f"eval/{c_idx}_")][0]
            assert aps[key] == pytest.approx(0.0, abs=1e-6), (key, aps)
