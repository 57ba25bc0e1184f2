"""Golden tests for the rotated-box geometry core.

References the math in the reference implementation
(``python/jdet/models/boxes/box_ops.py``,
``python/jdet/ops/bbox_transforms.py``) via independent numpy
reimplementations of single-box formulas.
"""

import math

import numpy as np
import pytest

from rs_detection_tpu.ops import box_ops as B

PI = math.pi
rng = np.random.RandomState(0)


def random_obbs(n, scale=100.0, version="le135"):
    cx = rng.uniform(10, scale, n)
    cy = rng.uniform(10, scale, n)
    w = rng.uniform(5, 50, n)
    h = rng.uniform(2, 40, n)
    t = rng.uniform(-PI, PI, n)
    boxes = np.stack([cx, cy, w, h, t], axis=1).astype(np.float32)
    boxes[:, 4] = B.norm_angle(boxes[:, 4], version)
    return boxes


class TestNormAngle:
    def test_le90_range(self):
        a = rng.uniform(-10, 10, 1000)
        out = B.norm_angle(a, "le90")
        assert np.all(out >= -PI / 2 - 1e-6) and np.all(out < PI / 2 + 1e-6)
        # equivalence modulo pi
        assert np.allclose(np.sin(2 * out), np.sin(2 * a), atol=1e-6)

    def test_le135_range(self):
        a = rng.uniform(-10, 10, 1000)
        out = B.norm_angle(a, "le135")
        assert np.all(out >= -PI / 4 - 1e-6) and np.all(out < 3 * PI / 4 + 1e-6)

    def test_identity_inside_range(self):
        a = np.array([-0.3, 0.0, 1.2, 1.8])
        assert np.allclose(B.norm_angle(a, "le90"), [-0.3, 0.0, 1.2, 1.8 - PI],
                           atol=1e-7)


class TestRegular:
    def test_regular_theta(self):
        t = rng.uniform(-10, 10, 500)
        out = B.regular_theta(t)
        assert np.all(out >= -PI / 2) and np.all(out < PI / 2)
        assert np.allclose(np.tan(out), np.tan(t), atol=1e-4)

    def test_regular_obb_w_ge_h(self):
        boxes = random_obbs(200)
        out = B.regular_obb(boxes)
        assert np.all(out[:, 2] >= out[:, 3] - 1e-5)
        # same vertex set
        p1 = np.sort(B.obb2poly(boxes).reshape(-1, 4, 2), axis=1)
        p2 = np.sort(B.obb2poly(out).reshape(-1, 4, 2), axis=1)
        assert np.allclose(p1, p2, atol=1e-3)


class TestPolyRoundTrip:
    @pytest.mark.parametrize("version", ["le90", "le135"])
    def test_obb_poly_obb(self, version):
        boxes = random_obbs(300, version=version)
        polys = B.rotated_box_to_poly(boxes, version, best_begin=False)
        back = B.poly_to_rotated_box(polys, version)
        assert np.allclose(back[:, :2], boxes[:, :2], atol=1e-3)
        # w is always the longer edge after round trip
        w = np.maximum(boxes[:, 2], boxes[:, 3])
        h = np.minimum(boxes[:, 2], boxes[:, 3])
        assert np.allclose(back[:, 2], w, atol=1e-3)
        assert np.allclose(back[:, 3], h, atol=1e-3)

    def test_single_known_case(self):
        # axis-aligned 20x10 box at (50, 60)
        box = np.array([[50.0, 60.0, 20.0, 10.0, 0.0]], np.float32)
        poly = B.rotated_box_to_poly(box, best_begin=False)
        expect = np.array([[40, 55, 60, 55, 60, 65, 40, 65]], np.float32)
        assert np.allclose(poly, expect, atol=1e-4)

    def test_best_begin_point(self):
        # start from BR corner; best-begin must rotate to TL-first order
        poly = np.array([[60, 65, 40, 65, 40, 55, 60, 55]], np.float32)
        out = B.get_best_begin_point(poly)
        assert np.allclose(out, [[40, 55, 60, 55, 60, 65, 40, 65]], atol=1e-5)

    def test_obbdet_convention_sign(self):
        # OBBDetection obb2poly uses negated angle vs JDet convention
        box = np.array([[0.0, 0.0, 20.0, 10.0, 0.3]], np.float32)
        p_jdet = B.rotated_box_to_poly(box, best_begin=False)
        neg = box.copy()
        neg[:, 4] *= -1
        p_obb = B.obb2poly(neg)
        s1 = np.sort(p_jdet.reshape(4, 2), axis=0)
        s2 = np.sort(p_obb.reshape(4, 2), axis=0)
        assert np.allclose(s1, s2, atol=1e-4)


class TestHbb:
    def test_obb2hbb_equals_poly_extents(self):
        boxes = random_obbs(200)
        hbb = B.obb2hbb(boxes)
        polys = B.obb2poly(boxes)
        xs, ys = polys[:, 0::2], polys[:, 1::2]
        assert np.allclose(hbb[:, 0], xs.min(1), atol=1e-4)
        assert np.allclose(hbb[:, 1], ys.min(1), atol=1e-4)
        assert np.allclose(hbb[:, 2], xs.max(1), atol=1e-4)
        assert np.allclose(hbb[:, 3], ys.max(1), atol=1e-4)

    def test_hbb2obb_round_trip(self):
        hbb = np.array([[10, 20, 50, 40], [0, 0, 5, 9]], np.float32)
        obb = B.hbb2obb(hbb)
        assert np.all(obb[:, 2] >= obb[:, 3])
        back = B.obb2hbb(obb)
        assert np.allclose(back, hbb, atol=1e-4)

    def test_rotated_box_to_bbox(self):
        boxes = random_obbs(100)
        hbb = B.rotated_box_to_bbox(boxes)
        polys = B.rotated_box_to_poly(boxes, best_begin=False)
        xs, ys = polys[:, 0::2], polys[:, 1::2]
        assert np.allclose(hbb,
                           np.stack([xs.min(1), ys.min(1),
                                     xs.max(1), ys.max(1)], 1), atol=1e-4)


class TestDeltaCoders:
    def test_hbb_encode_decode(self):
        n = 200
        props = np.sort(rng.uniform(0, 100, (n, 2, 2)), axis=1)
        props = props.transpose(0, 2, 1).reshape(n, 4).astype(np.float32)
        props = props[:, [0, 2, 1, 3]]  # x0 y0 x1 y1
        props[:, 2:] += 5  # ensure positive size
        gts = props + rng.uniform(-3, 3, (n, 4)).astype(np.float32)
        gts[:, 2:] = np.maximum(gts[:, 2:], gts[:, :2] + 1)
        means = (0.0, 0.0, 0.0, 0.0)
        stds = (0.1, 0.1, 0.2, 0.2)
        deltas = B.bbox2delta(props, gts, means, stds)
        dec = B.delta2bbox(props, deltas, means, stds)
        # legacy +1 convention: decode of encode has a known 1px shrink
        # on w/h; centers must round-trip exactly modulo that bias
        pw = props[:, 2] - props[:, 0] + 1
        gw = gts[:, 2] - gts[:, 0] + 1
        exp_w = (props[:, 2] - props[:, 0]) * gw / pw
        assert np.allclose(dec[:, 2] - dec[:, 0], exp_w, rtol=1e-4, atol=1e-3)

    def test_rotated_encode_decode_identity(self):
        rois = random_obbs(300)
        gts = random_obbs(300)
        means = (0., 0., 0., 0., 0.)
        stds = (0.1, 0.1, 0.2, 0.2, 0.1)
        deltas = B.bbox2delta_rotated(rois, gts, means, stds)
        dec = B.delta2bbox_rotated(rois, deltas, means, stds)
        assert np.allclose(dec[:, :2], gts[:, :2], atol=1e-2)
        assert np.allclose(dec[:, 2:4], gts[:, 2:4], rtol=1e-3, atol=1e-2)
        # angle equal modulo pi
        assert np.allclose(np.sin(2 * dec[:, 4]), np.sin(2 * gts[:, 4]),
                           atol=1e-3)

    def test_rotated_zero_delta(self):
        rois = random_obbs(50)
        deltas = np.zeros((50, 5), np.float32)
        dec = B.delta2bbox_rotated(rois, deltas)
        assert np.allclose(dec[:, :4], rois[:, :4], atol=1e-4)
        assert np.allclose(dec[:, 4], B.norm_angle(rois[:, 4]), atol=1e-5)

    def test_multiclass_decode_layout(self):
        rois = random_obbs(10)
        deltas = rng.randn(10, 15).astype(np.float32) * 0.05
        dec = B.delta2bbox_rotated(rois, deltas)
        assert dec.shape == (10, 15)
        one = B.delta2bbox_rotated(rois, deltas[:, 5:10])
        assert np.allclose(dec[:, 5:10], one, atol=1e-5)


class TestDistance2Obb:
    def test_centered(self):
        pts = np.array([[50.0, 50.0]], np.float32)
        # equal extents, zero angle -> box centered at the point
        dist = np.array([[10.0, 5.0, 10.0, 5.0, 0.0]], np.float32)
        obb = B.distance2obb(pts, dist)
        assert np.allclose(obb[0, :2], [50, 50], atol=1e-5)
        assert np.allclose(sorted(obb[0, 2:4]), [10, 20], atol=1e-5)


class TestJax:
    def test_jnp_matches_numpy(self):
        import jax
        import jax.numpy as jnp

        boxes = random_obbs(64)
        f = jax.jit(lambda b: B.rotated_box_to_poly(b, best_begin=True))
        out_j = np.asarray(f(jnp.asarray(boxes)))
        out_n = B.rotated_box_to_poly(boxes, best_begin=True)
        assert np.allclose(out_j, out_n, atol=1e-3)

        g = jax.jit(B.delta2bbox_rotated)
        deltas = rng.randn(64, 5).astype(np.float32) * 0.1
        assert np.allclose(np.asarray(g(jnp.asarray(boxes), jnp.asarray(deltas))),
                           B.delta2bbox_rotated(boxes, deltas), atol=1e-3)
