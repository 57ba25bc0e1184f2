"""Tests for anchor generators, assigner, sampler, coders,
anchor_target."""

import math

import jax
import jax.numpy as jnp
import numpy as np

from rs_detection_tpu.models.boxes import (
    AnchorGenerator, AnchorGeneratorRotatedS2ANet, DeltaXYWHABBoxCoder,
    MaxIoUAssigner, MidpointOffsetCoder, OrientedDeltaXYWHTCoder,
    PseudoSampler, RandomSampler, anchor_target_single,
    assign_wrt_overlaps, images_to_levels)
from rs_detection_tpu.ops import box_ops as B

rng = np.random.RandomState(11)


class TestAnchorGenRotated:
    def test_base_anchor_legacy_center(self):
        gen = AnchorGeneratorRotatedS2ANet(base_size=8, scales=[4],
                                           ratios=[1.0])
        ba = gen.base_anchors
        assert ba.shape == (1, 5)
        # legacy center 0.5*(8-1) = 3.5, size 32
        assert np.allclose(ba[0], [3.5, 3.5, 32, 32, 0])

    def test_ratio_convention(self):
        gen = AnchorGeneratorRotatedS2ANet(base_size=16, scales=[1],
                                           ratios=[4.0])
        ba = gen.base_anchors[0]
        # w = 16/sqrt(4) = 8? no: w_ratios = 1/sqrt(r) -> w = 16*0.5 = 8
        assert abs(ba[2] - 8.0) < 1e-5
        assert abs(ba[3] - 32.0) < 1e-5

    def test_grid_row_major(self):
        gen = AnchorGeneratorRotatedS2ANet(base_size=8, scales=[1],
                                           ratios=[1.0])
        anchors = gen.grid_anchors((2, 3), stride=16)
        assert anchors.shape == (6, 5)
        # x varies fastest
        assert np.allclose(anchors[:3, 0] - anchors[0, 0], [0, 16, 32])
        assert np.allclose(anchors[3, 1] - anchors[0, 1], 16)

    def test_valid_flags(self):
        gen = AnchorGeneratorRotatedS2ANet(base_size=8, scales=[1],
                                           ratios=[1.0])
        flags = gen.valid_flags((4, 4), (2, 3))
        assert flags.sum() == 6


class TestAnchorGenHbb:
    def test_competition_rpn_config(self):
        # scales=[8], 7 ratios, strides [4..64]
        gen = AnchorGenerator(strides=[4, 8, 16, 32, 64],
                              ratios=[0.125, 0.25, 0.5, 1.0, 2.0, 4.0, 8.0],
                              scales=[8])
        assert gen.num_levels == 5
        assert all(n == 7 for n in gen.num_base_anchors)
        ba = gen.base_anchors[0]  # base_size 4, scale 8 -> area 32^2
        w = ba[:, 2] - ba[:, 0]
        h = ba[:, 3] - ba[:, 1]
        assert np.allclose(w * h, 32 * 32, rtol=1e-4)
        # center offset 0 (mmdet v2: centered at origin)
        assert np.allclose((ba[:, 0] + ba[:, 2]) / 2, 0, atol=1e-4)

    def test_octave_scales(self):
        gen = AnchorGenerator(strides=[8], ratios=[1.0],
                              octave_base_scale=4, scales_per_octave=3)
        assert np.allclose(gen.scales, [4, 4 * 2 ** (1 / 3), 4 * 2 ** (2 / 3)],
                           rtol=1e-5)

    def test_grid(self):
        gen = AnchorGenerator(strides=[16], ratios=[1.0], scales=[1])
        anchors = gen.grid_anchors([(2, 2)])[0]
        assert anchors.shape == (4, 4)
        assert np.allclose(anchors[1, :2] - anchors[0, :2], [16, 0])


class TestAssigner:
    def test_basic_assignment(self):
        # 3 anchors, 2 gts (1 valid slot padded out)
        overlaps = jnp.array([
            [0.8, 0.0, 0.9],   # anchor0: best gt0
            [0.2, 0.0, 0.0],   # anchor1: below neg_thr -> negative
            [0.45, 0.0, 0.0],  # anchor2: between -> ignore
        ]).T  # -> [3 anchors, 3 gts]? build properly below
        overlaps = jnp.array([
            [0.8, 0.1, 0.0],
            [0.2, 0.1, 0.0],
            [0.45, 0.1, 0.0],
        ])  # [A=3, G=3]
        gt_mask = jnp.array([True, True, False])
        assigned, _ = assign_wrt_overlaps(
            overlaps, gt_mask, pos_iou_thr=0.5, neg_iou_thr=0.3,
            min_pos_iou=0.3, match_low_quality=False)
        assert assigned.tolist() == [1, 0, -1]

    def test_padded_gt_never_assigned(self):
        overlaps = jnp.array([[0.1, 0.99], [0.2, 0.95]])
        gt_mask = jnp.array([True, False])
        assigned, _ = assign_wrt_overlaps(
            overlaps, gt_mask, 0.5, 0.3, 0.3, True)
        assert (assigned <= 1).all()
        assert assigned.tolist() == [0, 0]

    def test_low_quality_rescue(self):
        # gt0's best anchor has IoU 0.4 < pos_thr but >= min_pos_iou
        overlaps = jnp.array([[0.4], [0.2]])
        gt_mask = jnp.array([True])
        assigned, _ = assign_wrt_overlaps(
            overlaps, gt_mask, 0.5, 0.3, 0.3, match_low_quality=True)
        assert assigned.tolist() == [1, 0]
        assigned, _ = assign_wrt_overlaps(
            overlaps, gt_mask, 0.5, 0.3, 0.3, match_low_quality=False)
        assert assigned.tolist() == [-1, 0]

    def test_anchor_mask_excludes(self):
        overlaps = jnp.array([[0.9], [0.8]])
        gt_mask = jnp.array([True])
        am = jnp.array([False, True])
        assigned, _ = assign_wrt_overlaps(
            overlaps, gt_mask, 0.5, 0.3, 0.3, True, anchor_mask=am)
        assert assigned.tolist() == [-1, 1]

    def test_with_boxes(self):
        assigner = MaxIoUAssigner(pos_iou_thr=0.5, neg_iou_thr=0.3,
                                  min_pos_iou=0.3)
        anchors = jnp.array([[0, 0, 10, 10], [20, 20, 30, 30],
                             [100, 100, 110, 110]], jnp.float32)
        gts = jnp.array([[0, 0, 10, 10], [0, 0, 0, 0]], jnp.float32)
        gt_mask = jnp.array([True, False])
        assigned, _ = assigner.assign(anchors, gts, gt_mask)
        assert assigned[0] == 1
        assert assigned[1] == 0 and assigned[2] == 0


class TestSampler:
    def test_pseudo(self):
        assigned = jnp.array([1, 0, -1, 2])
        pos, neg = PseudoSampler().sample(assigned)
        assert pos.tolist() == [True, False, False, True]
        assert neg.tolist() == [False, True, False, False]

    def test_random_caps_positives(self):
        n = 100
        assigned = jnp.ones((n,), jnp.int32)  # all positive
        s = RandomSampler(num=16, pos_fraction=0.25)
        pos, neg = s.sample(assigned, jax.random.PRNGKey(0))
        assert int(pos.sum()) == 4
        assert int(neg.sum()) == 0

    def test_random_fills_negatives(self):
        assigned = jnp.concatenate([jnp.ones((2,), jnp.int32),
                                    jnp.zeros((100,), jnp.int32)])
        s = RandomSampler(num=16, pos_fraction=0.25)
        pos, neg = s.sample(assigned, jax.random.PRNGKey(1))
        assert int(pos.sum()) == 2
        assert int(neg.sum()) == 14  # 16 - 2

    def test_randomness_differs(self):
        assigned = jnp.zeros((50,), jnp.int32)
        s = RandomSampler(num=10, pos_fraction=0.5)
        _, neg1 = s.sample(assigned, jax.random.PRNGKey(0))
        _, neg2 = s.sample(assigned, jax.random.PRNGKey(1))
        assert not np.array_equal(np.asarray(neg1), np.asarray(neg2))


class TestCoders:
    def test_oriented_encode_decode(self):
        rois = np.stack([rng.uniform(20, 80, 50), rng.uniform(20, 80, 50),
                         rng.uniform(10, 30, 50), rng.uniform(5, 15, 50),
                         rng.uniform(-math.pi / 2, math.pi / 2, 50)],
                        1).astype(np.float32)
        gts = rois + rng.uniform(-2, 2, rois.shape).astype(np.float32) * \
            np.array([1, 1, 1, 1, 0.05], np.float32)
        coder = OrientedDeltaXYWHTCoder(target_stds=(0.1, 0.1, 0.2, 0.2, 0.1))
        dec = coder.decode(rois, coder.encode(rois, gts))
        # round trip reproduces the gt box set (up to obb representation)
        p1 = np.sort(B.obb2poly(dec).reshape(-1, 4, 2), axis=1)
        p2 = np.sort(B.obb2poly(gts).reshape(-1, 4, 2), axis=1)
        assert np.allclose(p1, p2, atol=0.1)

    def test_midpoint_encode_decode(self):
        obbs = np.stack([rng.uniform(30, 70, 40), rng.uniform(30, 70, 40),
                         rng.uniform(15, 30, 40), rng.uniform(8, 14, 40),
                         rng.uniform(-math.pi / 2, math.pi / 2, 40)],
                        1).astype(np.float32)
        hbb_anchor = B.obb2hbb(obbs) + \
            rng.uniform(-2, 2, (40, 4)).astype(np.float32)
        coder = MidpointOffsetCoder()
        deltas = coder.encode(hbb_anchor, obbs)
        assert deltas.shape == (40, 6)
        dec = coder.decode(hbb_anchor, deltas)
        assert dec.shape == (40, 5)
        p1 = np.sort(B.obb2poly(dec).reshape(-1, 4, 2), axis=1)
        p2 = np.sort(B.obb2poly(obbs).reshape(-1, 4, 2), axis=1)
        assert np.allclose(p1, p2, atol=0.5)

    def test_xywha_coder(self):
        coder = DeltaXYWHABBoxCoder()
        rois = np.array([[50, 50, 20, 10, 0.2]], np.float32)
        gt = np.array([[52, 48, 22, 12, 0.3]], np.float32)
        dec = coder.decode(rois, coder.encode(rois, gt))
        assert np.allclose(dec[:, :4], gt[:, :4], atol=1e-2)


class TestAnchorTarget:
    def test_end_to_end(self):
        a = 64
        anchors = np.stack([
            rng.uniform(0, 100, a), rng.uniform(0, 100, a),
            np.full(a, 20.0), np.full(a, 10.0), np.zeros(a)],
            1).astype(np.float32)
        gts = np.zeros((8, 5), np.float32)
        gts[0] = [anchors[0, 0], anchors[0, 1], 20, 10, 0]  # exact match
        gt_mask = np.zeros(8, bool)
        gt_mask[0] = True
        gt_labels = np.zeros(8, np.int32)
        gt_labels[0] = 3

        assigner = MaxIoUAssigner(pos_iou_thr=0.5, neg_iou_thr=0.4,
                                  min_pos_iou=0.0,
                                  iou_calculator=dict(
                                      type="BboxOverlaps2D_rotated"))
        coder = DeltaXYWHABBoxCoder()
        res = anchor_target_single(
            jnp.asarray(anchors), jnp.ones(a, bool), jnp.asarray(gts),
            jnp.asarray(gt_mask), jnp.asarray(gt_labels),
            assigner, PseudoSampler(), coder.encode)
        labels = np.asarray(res.labels)
        assert labels[0] == 3
        assert res.bbox_weights[0].sum() == 5
        # exact-match anchor encodes to ~zero deltas
        assert np.allclose(np.asarray(res.bbox_targets)[0], 0, atol=1e-4)
        assert int(res.num_pos) >= 1

    def test_images_to_levels(self):
        t = jnp.arange(2 * 10).reshape(2, 10)
        lv = images_to_levels(t, [6, 4])
        assert lv[0].shape == (2, 6) and lv[1].shape == (2, 4)
