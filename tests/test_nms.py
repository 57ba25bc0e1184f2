"""NMS tests: horizontal, rotated, polygon — greedy semantics and
cross-consistency between host and jit paths."""

import math

import numpy as np

from rs_detection_tpu.ops import box_ops as B
from rs_detection_tpu.ops.nms import nms, nms_mask, bbox_overlaps_hbb
from rs_detection_tpu.ops.nms_poly import (iou_poly_single, poly_nms_numpy,
                                           iou_polys_np)
from rs_detection_tpu.ops.nms_rotated import (ml_nms_rotated,
                                              multiclass_nms_rotated,
                                              nms_rotated)

rng = np.random.RandomState(7)


def ref_nms_hbb(boxes, scores, thr):
    """Straightforward O(N^2) greedy reference."""
    order = np.argsort(-scores)
    keep = []
    sup = np.zeros(len(scores), bool)
    for i in order:
        if sup[i]:
            continue
        keep.append(i)
        ious = np.asarray(bbox_overlaps_hbb(boxes[i:i + 1], boxes))[0]
        sup |= ious > thr
        sup[i] = True
    return np.array(keep)


class TestHbbNms:
    def test_simple(self):
        boxes = np.array([[0, 0, 10, 10], [1, 1, 11, 11], [50, 50, 60, 60]],
                         np.float32)
        scores = np.array([0.9, 0.8, 0.7], np.float32)
        keep = nms(boxes, scores, 0.5)
        assert keep.tolist() == [0, 2]

    def test_vs_reference(self):
        n = 100
        boxes = rng.uniform(0, 80, (n, 2)).astype(np.float32)
        boxes = np.concatenate(
            [boxes, boxes + rng.uniform(5, 30, (n, 2)).astype(np.float32)], 1)
        scores = rng.uniform(0, 1, n).astype(np.float32)
        got = sorted(nms(boxes, scores, 0.4).tolist())
        want = sorted(ref_nms_hbb(boxes, scores, 0.4).tolist())
        assert got == want

    def test_valid_mask(self):
        import jax.numpy as jnp
        boxes = np.array([[0, 0, 10, 10], [0, 0, 10, 10]], np.float32)
        scores = np.array([0.5, 0.9], np.float32)
        # higher-scored box is marked invalid (padding) -> other survives
        keep = np.asarray(nms_mask(jnp.asarray(boxes), jnp.asarray(scores),
                                   0.5, valid=jnp.array([True, False])))
        assert keep.tolist() == [True, False]


class TestRotatedNms:
    def test_reference_case(self):
        # from the reference self-test (nms_rotated.py:598-603)
        dets = np.array([[0, 0, 1, 1, 0], [0, 0, 0.5, 0.5, 0.3],
                         [0, 0, 0.9, 0.9, 0]], np.float32)
        scores = np.array([0.1, 0.2, 0.3], np.float32)
        keep = nms_rotated(dets, scores, 0.3)
        # box2 (0.9x0.9) wins; box0 overlaps it heavily; box1 iou small
        assert 2 in keep.tolist()
        assert 0 not in keep.tolist()

    def test_identical_boxes_suppressed(self):
        dets = np.tile(np.array([[10, 10, 8, 4, 0.5]], np.float32), (5, 1))
        scores = np.arange(5).astype(np.float32) / 5
        keep = nms_rotated(dets, scores, 0.5)
        assert keep.tolist() == [4]

    def test_class_aware(self):
        dets = np.tile(np.array([[10, 10, 8, 4, 0.5]], np.float32), (2, 1))
        scores = np.array([0.9, 0.8], np.float32)
        labels = np.array([0, 1])
        keep = ml_nms_rotated(dets, scores, labels, 0.5)
        assert sorted(keep.tolist()) == [0, 1]  # different classes survive

    def test_multiclass(self):
        n, c = 20, 3
        boxes = np.concatenate([
            rng.uniform(20, 60, (n, 2)), rng.uniform(5, 20, (n, 2)),
            rng.uniform(-1, 1, (n, 1))], 1).astype(np.float32)
        scores = rng.uniform(0, 1, (n, c + 1)).astype(np.float32)
        dets, labels = multiclass_nms_rotated(
            boxes, scores, 0.05, dict(type="nms_rotated", iou_thr=0.1),
            max_num=50)
        assert dets.shape[1] == 6
        assert dets.shape[0] == labels.shape[0]
        assert (labels >= 0).all() and (labels < c).all()
        # scores sorted descending
        assert np.all(np.diff(dets[:, 5]) <= 1e-6)


class TestPolyNms:
    def test_iou_poly_known(self):
        sq1 = [0, 0, 10, 0, 10, 10, 0, 10]
        sq2 = [5, 0, 15, 0, 15, 10, 5, 10]
        assert abs(iou_poly_single(sq1, sq2) - 50 / 150) < 1e-6

    def test_iou_polys_batch(self):
        q = np.array([0, 0, 10, 0, 10, 10, 0, 10], np.float64)
        cands = np.array([
            [5, 0, 15, 0, 15, 10, 5, 10],
            [20, 20, 30, 20, 30, 30, 20, 30],
            [0, 0, 10, 0, 10, 10, 0, 10],
        ], np.float64)
        out = iou_polys_np(q, cands)
        assert abs(out[0] - 1 / 3) < 1e-6
        assert out[1] == 0.0
        assert abs(out[2] - 1.0) < 1e-6

    def test_poly_nms(self):
        base = np.array([0, 0, 10, 0, 10, 10, 0, 10], np.float64)
        dets = np.stack([
            np.concatenate([base, [0.9]]),
            np.concatenate([base + 0.5, [0.8]]),   # heavy overlap
            np.concatenate([base + 100, [0.7]]),   # disjoint
        ])
        keep = poly_nms_numpy(dets, 0.3)
        assert keep.tolist() == [0, 2]

    def test_rotated_consistency(self):
        obbs = np.stack([
            rng.uniform(30, 60, 30), rng.uniform(30, 60, 30),
            rng.uniform(10, 25, 30), rng.uniform(5, 15, 30),
            rng.uniform(-math.pi / 2, math.pi / 2, 30)], 1).astype(np.float32)
        polys = B.rotated_box_to_poly(obbs, best_begin=False)
        from rs_detection_tpu.ops.rotated_iou import box_iou_rotated
        dev = np.asarray(box_iou_rotated(obbs, obbs))
        for i in range(0, 30, 6):
            host = iou_polys_np(polys[i], polys)
            assert np.allclose(host, dev[i], atol=2e-3)
