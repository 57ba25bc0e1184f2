"""Host-side generic box geometry (ops/bbox_geometry.py)."""

import numpy as np

from rs_detection_tpu.ops.bbox_geometry import (bbox_area_nms, bbox_areas,
                                                bbox_nms, bbox_overlaps)


def test_hbb_overlaps():
    a = np.array([[0, 0, 10, 10], [20, 20, 30, 30]], np.float32)
    b = np.array([[5, 5, 15, 15]], np.float32)
    iou = bbox_overlaps(a, b)
    assert iou.shape == (2, 1)
    np.testing.assert_allclose(iou[0, 0], 25.0 / 175.0, rtol=1e-5)
    assert iou[1, 0] == 0.0


def test_hbb_iof():
    a = np.array([[0, 0, 10, 10]], np.float32)
    b = np.array([[0, 0, 20, 20]], np.float32)
    iof = bbox_overlaps(a, b, mode="iof")
    np.testing.assert_allclose(iof[0, 0], 1.0, rtol=1e-5)


def test_obb_vs_hbb_overlaps():
    # axis-aligned obb == its hbb
    obb = np.array([[5, 5, 10, 10, 0.0]], np.float32)
    hbb = np.array([[0, 0, 10, 10]], np.float32)
    iou = bbox_overlaps(obb, hbb)
    np.testing.assert_allclose(iou[0, 0], 1.0, atol=1e-5)


def test_poly_areas():
    poly = np.array([[0, 0, 4, 0, 4, 3, 0, 3]], np.float32)
    np.testing.assert_allclose(bbox_areas(poly), [12.0])
    hbb = np.array([[1, 1, 5, 3]], np.float32)
    np.testing.assert_allclose(bbox_areas(hbb), [8.0])
    obb = np.array([[0, 0, 4, 2, 0.7]], np.float32)
    np.testing.assert_allclose(bbox_areas(obb), [8.0])


def test_bbox_nms():
    boxes = np.array([[0, 0, 10, 10], [1, 1, 11, 11], [50, 50, 60, 60]],
                     np.float32)
    scores = np.array([0.9, 0.8, 0.7], np.float32)
    keep = bbox_nms(boxes, scores, iou_thr=0.5)
    assert list(keep) == [0, 2]


def test_bbox_area_nms():
    boxes = np.array([[0, 0, 20, 20], [1, 1, 19, 19], [50, 50, 60, 60]],
                     np.float32)
    keep = bbox_area_nms(boxes, iou_thr=0.5)
    assert list(keep) == [0, 2]
