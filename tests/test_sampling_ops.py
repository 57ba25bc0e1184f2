"""Tests for RoIAlign (h/rotated), deformable conv, ORN, FR."""

import math

import jax
import jax.numpy as jnp
import numpy as np

from rs_detection_tpu.ops.deform_conv import deform_conv2d
from rs_detection_tpu.ops.fr import feature_refine
from rs_detection_tpu.ops.orn import (active_rotating_filter,
                                      arf_gather_indices, arf_indices,
                                      rotation_invariant_encoding,
                                      rotation_invariant_pooling)
from rs_detection_tpu.ops.roi_align import (roi_align, roi_align_rotated)
from rs_detection_tpu.ops.sampling import bilinear_sample

rng = np.random.RandomState(3)


class TestBilinear:
    def test_exact_at_integers(self):
        feat = rng.rand(8, 8, 3).astype(np.float32)
        y = jnp.array([2.0, 5.0])
        x = jnp.array([3.0, 7.0])
        out = np.asarray(bilinear_sample(jnp.asarray(feat), y, x))
        assert np.allclose(out[0], feat[2, 3], atol=1e-6)
        assert np.allclose(out[1], feat[5, 7], atol=1e-6)

    def test_midpoint(self):
        feat = np.zeros((4, 4, 1), np.float32)
        feat[1, 1] = 1.0
        out = np.asarray(bilinear_sample(jnp.asarray(feat),
                                         jnp.array([1.5]), jnp.array([1.0])))
        assert abs(out[0, 0] - 0.5) < 1e-6

    def test_out_of_bounds_zero(self):
        feat = np.ones((4, 4, 1), np.float32)
        out = np.asarray(bilinear_sample(
            jnp.asarray(feat), jnp.array([-2.0, 10.0]), jnp.array([0.0, 0.0])))
        assert np.all(out == 0)

    def test_border_band(self):
        # y in (-1, 0) clamps to row 0 with full weight
        feat = np.arange(16).reshape(4, 4, 1).astype(np.float32)
        out = np.asarray(bilinear_sample(
            jnp.asarray(feat), jnp.array([-0.5]), jnp.array([1.0])))
        assert abs(out[0, 0] - feat[0, 1, 0]) < 1e-6


class TestRoiAlign:
    def test_constant_feature(self):
        feat = np.full((1, 16, 16, 4), 3.0, np.float32)
        rois = np.array([[0, 2, 2, 10, 10]], np.float32)
        out = np.asarray(roi_align(jnp.asarray(feat), jnp.asarray(rois),
                                   7, 1.0, 2))
        assert out.shape == (1, 7, 7, 4)
        assert np.allclose(out, 3.0, atol=1e-5)

    def test_linear_gradient_field(self):
        # f(x, y) = x -> pooled values reproduce bin centers
        h = w = 32
        xs = np.arange(w, dtype=np.float32)
        feat = np.tile(xs[None, :, None], (h, 1, 1))[None]
        rois = np.array([[0, 4, 4, 20, 20]], np.float32)
        out = np.asarray(roi_align(jnp.asarray(feat), jnp.asarray(rois),
                                   4, 1.0, 2))[0, :, :, 0]
        bin_w = 16 / 4
        expected_cols = 4 + (np.arange(4) + 0.5) * bin_w
        assert np.allclose(out[0], expected_cols, atol=1e-4)
        assert np.allclose(out, np.tile(expected_cols[None], (4, 1)),
                           atol=1e-4)

    def test_batch_index(self):
        feat = np.stack([np.zeros((8, 8, 1)), np.ones((8, 8, 1))]) \
            .astype(np.float32)
        rois = np.array([[1, 1, 1, 6, 6], [0, 1, 1, 6, 6]], np.float32)
        out = np.asarray(roi_align(jnp.asarray(feat), jnp.asarray(rois),
                                   3, 1.0, 2))
        assert np.allclose(out[0], 1.0) and np.allclose(out[1], 0.0)


class TestRoiAlignRotated:
    def test_zero_angle_matches_centered_hbb(self):
        feat = rng.rand(1, 32, 32, 2).astype(np.float32)
        # rotated roi at center (16,16), 16x8, angle 0
        rrois = np.array([[0, 16, 16, 16, 8, 0.0]], np.float32)
        out_r = np.asarray(roi_align_rotated(jnp.asarray(feat),
                                             jnp.asarray(rrois), 7, 1.0, 2))
        # equivalent horizontal roi [8, 12, 24, 20] with the 0.5 center
        # offset convention difference: rotated uses cx*s-0.5
        hrois = np.array([[0, 16 - 8 - 0.5, 16 - 4 - 0.5,
                           16 + 8 - 0.5, 16 + 4 - 0.5]], np.float32)
        out_h = np.asarray(roi_align(jnp.asarray(feat), jnp.asarray(hrois),
                                     7, 1.0, 2))
        assert np.allclose(out_r, out_h, atol=1e-4)

    def test_rotation_90deg(self):
        # a vertical stripe feature rotated 90deg becomes horizontal
        feat = np.zeros((1, 33, 33, 1), np.float32)
        feat[0, :, 14:19, 0] = 1.0
        roi0 = np.array([[0, 16, 16, 24, 6, 0.0]], np.float32)
        roi90 = np.array([[0, 16, 16, 24, 6, math.pi / 2]], np.float32)
        out0 = np.asarray(roi_align_rotated(jnp.asarray(feat),
                                            jnp.asarray(roi0), 5, 1.0, 2))
        out90 = np.asarray(roi_align_rotated(jnp.asarray(feat),
                                             jnp.asarray(roi90), 5, 1.0, 2))
        # roi0: stripe crosses the short axis center -> center column hot
        assert out0[0, :, 2, 0].mean() > 0.9
        # roi90: the roi's x-axis is now vertical; stripe lies along it
        assert out90[0, 2, :, 0].mean() > 0.9

    def test_gradients_flow(self):
        feat = jnp.asarray(rng.rand(1, 16, 16, 2).astype(np.float32))
        rois = jnp.asarray(np.array([[0, 8, 8, 10, 6, 0.4]], np.float32))

        def loss(f):
            return roi_align_rotated(f, rois, 7, 1.0, 2).sum()

        g = jax.grad(loss)(feat)
        assert np.isfinite(np.asarray(g)).all()
        assert np.abs(np.asarray(g)).sum() > 0


class TestDeformConv:
    def test_zero_offset_equals_conv(self):
        n, h, w, c, co, k = 2, 8, 8, 4, 6, 3
        x = rng.rand(n, h, w, c).astype(np.float32)
        wgt = rng.rand(k, k, c, co).astype(np.float32) * 0.1
        off = np.zeros((n, h, w, 2 * k * k), np.float32)
        out = np.asarray(deform_conv2d(jnp.asarray(x), jnp.asarray(off),
                                       jnp.asarray(wgt)))
        ref = jax.lax.conv_general_dilated(
            jnp.asarray(x), jnp.asarray(wgt), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        assert np.allclose(out, np.asarray(ref), atol=1e-4)

    def test_integer_shift_offset(self):
        # shifting all taps by +1 in x == conv of x shifted by -1
        n, h, w, c, co, k = 1, 10, 10, 2, 3, 3
        x = rng.rand(n, h, w, c).astype(np.float32)
        wgt = rng.rand(k, k, c, co).astype(np.float32) * 0.1
        off = np.zeros((n, h, w, 2 * k * k), np.float32)
        off[..., 1::2] = 1.0  # dx = +1
        out = np.asarray(deform_conv2d(jnp.asarray(x), jnp.asarray(off),
                                       jnp.asarray(wgt)))
        x_shift = np.roll(x, -1, axis=2)
        ref = np.asarray(jax.lax.conv_general_dilated(
            jnp.asarray(x_shift), jnp.asarray(wgt), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC")))
        # interior only (borders differ due to zero-pad vs roll)
        assert np.allclose(out[:, 2:-2, 2:-2], ref[:, 2:-2, 2:-2], atol=1e-4)

    def test_mask_modulation(self):
        n, h, w, c, co, k = 1, 6, 6, 2, 3, 3
        x = rng.rand(n, h, w, c).astype(np.float32)
        wgt = rng.rand(k, k, c, co).astype(np.float32)
        off = np.zeros((n, h, w, 2 * k * k), np.float32)
        mask0 = np.zeros((n, h, w, k * k), np.float32)
        out = np.asarray(deform_conv2d(jnp.asarray(x), jnp.asarray(off),
                                       jnp.asarray(wgt),
                                       mask=jnp.asarray(mask0)))
        assert np.allclose(out, 0.0, atol=1e-6)

    def test_grads(self):
        n, h, w, c, co, k = 1, 6, 6, 2, 3, 3
        x = jnp.asarray(rng.rand(n, h, w, c).astype(np.float32))
        wgt = jnp.asarray(rng.rand(k, k, c, co).astype(np.float32))
        off = jnp.asarray(rng.randn(n, h, w, 2 * k * k).astype(np.float32))

        grads = jax.grad(
            lambda x_, o_, w_: deform_conv2d(x_, o_, w_).sum(),
            argnums=(0, 1, 2))(x, off, wgt)
        for g in grads:
            assert np.isfinite(np.asarray(g)).all()
            assert np.abs(np.asarray(g)).sum() > 0


class TestOrn:
    def test_indices_table_matches_reference_shape(self):
        idx = arf_indices(8, 8, 3)
        assert idx.shape == (72, 8)
        assert idx.min() >= 1 and idx.max() <= 72
        # each rotation is a permutation
        for r in range(8):
            assert len(set(idx[:, r])) == 72
        # rotation 0 is identity
        assert np.array_equal(idx[:, 0], np.arange(1, 73))

    def test_arf_identity_rotation(self):
        cout, cin, n_or, k = 4, 3, 8, 3
        wgt = jnp.asarray(rng.rand(cout, cin, n_or * k * k)
                          .astype(np.float32))
        gi = arf_gather_indices(n_or, 8, k)
        out = np.asarray(active_rotating_filter(wgt, gi))
        assert out.shape == (cout * 8, cin, n_or * k * k)
        # rotation 0 is the original weight
        assert np.allclose(out[0::8][np.arange(cout) == 0][0],
                           np.asarray(wgt)[0], atol=1e-6)
        assert np.allclose(out[0 * 8 + 0], np.asarray(wgt)[0])
        assert np.allclose(out[1 * 8 + 0], np.asarray(wgt)[1])

    def test_rip(self):
        x = jnp.asarray(rng.rand(2, 4, 4, 16).astype(np.float32))
        out = np.asarray(rotation_invariant_pooling(x, 8))
        assert out.shape == (2, 4, 4, 2)
        ref = np.asarray(x).reshape(2, 4, 4, 2, 8).max(-1)
        assert np.allclose(out, ref)

    def test_rie(self):
        x = jnp.asarray(rng.rand(3, 16).astype(np.float32))
        aligned, main = rotation_invariant_encoding(x, 8)
        aligned = np.asarray(aligned).reshape(3, 2, 8)
        # after alignment the max element is at orientation 0
        assert np.allclose(aligned.argmax(-1), 0)


class TestFeatureRefine:
    def test_center_sampling_adds_feature(self):
        n, h, w, c = 1, 8, 8, 2
        feat = rng.rand(n, h, w, c).astype(np.float32)
        boxes = np.zeros((n, h, w, 5), np.float32)
        # box centers = own cell -> doubles the feature
        ys, xs = np.mgrid[0:h, 0:w].astype(np.float32)
        boxes[..., 0] = xs
        boxes[..., 1] = ys
        boxes[..., 2] = 4
        boxes[..., 3] = 2
        out = np.asarray(feature_refine(jnp.asarray(feat),
                                        jnp.asarray(boxes), 1.0, points=1))
        assert np.allclose(out, 2 * feat, atol=1e-5)

    def test_five_points(self):
        feat = jnp.asarray(np.ones((1, 8, 8, 1), np.float32))
        boxes = np.zeros((1, 8, 8, 5), np.float32)
        boxes[..., 0] = 4
        boxes[..., 1] = 4
        boxes[..., 2] = 2
        boxes[..., 3] = 2
        out = np.asarray(feature_refine(feat, jnp.asarray(boxes), 1.0,
                                        points=5))
        # 1 (orig) + 5 sampled ones
        assert np.allclose(out, 6.0, atol=1e-4)


class TestPyramidRoiAlign:
    def test_matches_per_level(self):
        from rs_detection_tpu.ops.roi_align import (
            roi_align_rotated, roi_align_rotated_pyramid)

        rng2 = np.random.RandomState(9)
        strides = (4, 8, 16, 32)
        feats = [jnp.asarray(rng2.rand(2, 64 // (s // 4), 64 // (s // 4),
                                       8).astype(np.float32))
                 for s in strides]
        # rois spanning all levels (sqrt areas around 56*2^l)
        rois = []
        for lvl, s in enumerate(strides):
            size = 56.0 * (2 ** lvl) * 1.01
            rois.append([lvl % 2, 100 + lvl * 10, 120, size, size, 0.3])
            rois.append([(lvl + 1) % 2, 90, 80 + lvl * 7,
                         size * 1.2, size * 0.8, -0.5])
        rois = jnp.asarray(np.asarray(rois, np.float32))
        got = np.asarray(roi_align_rotated_pyramid(
            feats, rois, 7, strides=strides, sampling_ratio=2))

        lvls = np.clip(np.floor(np.log2(
            np.sqrt(np.asarray(rois)[:, 3] * np.asarray(rois)[:, 4])
            / 56.0 + 1e-6)), 0, 3).astype(int)
        for i in range(rois.shape[0]):
            lvl = lvls[i]
            want = np.asarray(roi_align_rotated(
                feats[lvl], rois[i:i + 1], 7, 1.0 / strides[lvl], 2))
            assert np.allclose(got[i], want[0], atol=2e-4), i


class TestPallasDwConv:
    def test_matches_xla(self):
        from rs_detection_tpu.ops.pallas_dwconv import depthwise_conv2d

        rng2 = np.random.RandomState(1)
        for k, d, c in ((5, 1, 16), (7, 3, 16), (3, 1, 8)):
            x = jnp.asarray(rng2.rand(2, 24, 20, c).astype(np.float32))
            w = jnp.asarray(rng2.rand(k, k, c).astype(np.float32))
            got = np.asarray(depthwise_conv2d(x, w, k, d))
            pad = d * (k - 1) // 2
            ref = np.asarray(jax.lax.conv_general_dilated(
                x, w.reshape(k, k, 1, c), (1, 1),
                [(pad, pad), (pad, pad)], rhs_dilation=(d, d),
                feature_group_count=c,
                dimension_numbers=("NHWC", "HWIO", "NHWC")))
            assert np.allclose(got, ref, atol=1e-4), (k, d)

    def test_grads_match_xla(self):
        from rs_detection_tpu.ops.pallas_dwconv import depthwise_conv2d

        rng2 = np.random.RandomState(2)
        c = 8
        x = jnp.asarray(rng2.rand(1, 16, 16, c).astype(np.float32))
        w = jnp.asarray(rng2.rand(5, 5, c).astype(np.float32))
        g = jax.grad(lambda a, b: depthwise_conv2d(a, b, 5, 1).sum(),
                     argnums=(0, 1))(x, w)
        gref = jax.grad(
            lambda a, b: jax.lax.conv_general_dilated(
                a, b.reshape(5, 5, 1, c), (1, 1), [(2, 2), (2, 2)],
                feature_group_count=c,
                dimension_numbers=("NHWC", "HWIO", "NHWC")).sum(),
            argnums=(0, 1))(x, w)
        assert np.allclose(np.asarray(g[0]), np.asarray(gref[0]),
                           atol=1e-4)
        assert np.allclose(np.asarray(g[1]),
                           np.asarray(gref[1]).reshape(5, 5, c),
                           atol=1e-4)
