"""Golden tests for exact rotated IoU against OpenCV's convex-convex
intersection (independent implementation)."""

import math

import cv2
import numpy as np
import pytest

from rs_detection_tpu.ops import box_ops as B
from rs_detection_tpu.ops.rotated_iou import (box_iou_rotated, poly_iou)

rng = np.random.RandomState(42)


def cv2_pair_iou(b1, b2, mode="iou"):
    p1 = B.rotated_box_to_poly(b1[None], best_begin=False)[0].reshape(4, 2)
    p2 = B.rotated_box_to_poly(b2[None], best_begin=False)[0].reshape(4, 2)
    inter, _ = cv2.intersectConvexConvex(
        p1.astype(np.float32), p2.astype(np.float32))
    a1 = b1[2] * b1[3]
    a2 = b2[2] * b2[3]
    denom = (a1 + a2 - inter) if mode == "iou" else a1
    return inter / denom if denom > 0 else 0.0


def random_obbs(n, lo=20, hi=80):
    cx = rng.uniform(lo, hi, n)
    cy = rng.uniform(lo, hi, n)
    w = rng.uniform(5, 40, n)
    h = rng.uniform(5, 40, n)
    t = rng.uniform(-math.pi, math.pi, n)
    return np.stack([cx, cy, w, h, t], 1).astype(np.float32)


class TestBoxIouRotated:
    def test_identical_boxes(self):
        b = random_obbs(20)
        iou = np.asarray(box_iou_rotated(b, b))
        assert np.allclose(np.diag(iou), 1.0, atol=1e-4)

    def test_disjoint(self):
        b1 = np.array([[10, 10, 5, 5, 0.3]], np.float32)
        b2 = np.array([[100, 100, 5, 5, -0.7]], np.float32)
        assert np.asarray(box_iou_rotated(b1, b2))[0, 0] == 0.0

    def test_contained(self):
        outer = np.array([[50, 50, 40, 20, 0.5]], np.float32)
        inner = np.array([[50, 50, 10, 5, 0.5]], np.float32)
        iou = np.asarray(box_iou_rotated(outer, inner))[0, 0]
        expect = (10 * 5) / (40 * 20)
        assert abs(iou - expect) < 1e-4

    def test_axis_aligned_known(self):
        b1 = np.array([[5, 5, 10, 10, 0.0]], np.float32)
        b2 = np.array([[10, 5, 10, 10, 0.0]], np.float32)
        # overlap 5x10 = 50, union 150
        assert abs(np.asarray(box_iou_rotated(b1, b2))[0, 0] - 1 / 3) < 1e-4

    def test_45deg_cross(self):
        # unit square vs itself rotated 45 deg: octagon intersection
        b1 = np.array([[0, 0, 2, 2, 0.0]], np.float32)
        b2 = np.array([[0, 0, 2, 2, math.pi / 4]], np.float32)
        inter = 8 * (math.sqrt(2) - 1)  # regular octagon area
        expect = inter / (8 - inter)
        assert abs(np.asarray(box_iou_rotated(b1, b2))[0, 0] - expect) < 1e-3

    @pytest.mark.parametrize("mode", ["iou", "iof"])
    @pytest.mark.slow
    def test_random_vs_cv2(self, mode):
        b1 = random_obbs(40)
        b2 = random_obbs(30)
        got = np.asarray(box_iou_rotated(b1, b2, mode=mode))
        for i in range(0, 40, 7):
            for j in range(0, 30, 5):
                ref = cv2_pair_iou(b1[i], b2[j], mode)
                assert abs(got[i, j] - ref) < 2e-3, (i, j, got[i, j], ref)

    def test_row_blocking_consistent(self):
        b1 = random_obbs(100)
        b2 = random_obbs(13)
        full = np.asarray(box_iou_rotated(b1, b2, row_block=512))
        blocked = np.asarray(box_iou_rotated(b1, b2, row_block=32))
        assert np.allclose(full, blocked, atol=1e-6)

    def test_symmetry(self):
        b1 = random_obbs(25)
        b2 = random_obbs(25)
        a = np.asarray(box_iou_rotated(b1, b2))
        bt = np.asarray(box_iou_rotated(b2, b1))
        assert np.allclose(a, bt.T, atol=1e-4)

    def test_degenerate_zero_size(self):
        b1 = np.array([[10, 10, 0, 0, 0.0]], np.float32)
        b2 = np.array([[10, 10, 5, 5, 0.0]], np.float32)
        assert np.asarray(box_iou_rotated(b1, b2))[0, 0] == 0.0


class TestPolyIou:
    def test_matches_box_iou(self):
        b1 = random_obbs(15)
        b2 = random_obbs(12)
        p1 = B.rotated_box_to_poly(b1, best_begin=False)
        p2 = B.rotated_box_to_poly(b2, best_begin=False)
        got = np.asarray(poly_iou(p1, p2))
        ref = np.asarray(box_iou_rotated(b1, b2))
        assert np.allclose(got, ref, atol=2e-3)

    def test_identical(self):
        p = B.rotated_box_to_poly(random_obbs(10), best_begin=False)
        iou = np.asarray(poly_iou(p, p))
        assert np.allclose(np.diag(iou), 1.0, atol=1e-4)
