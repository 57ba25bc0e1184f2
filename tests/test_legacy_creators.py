"""Legacy (py-faster-rcnn style) creators — host-side parity."""

import numpy as np

from rs_detection_tpu.models.roi_heads.legacy_creators import (
    AnchorTargetCreator, ProposalCreator, ProposalTargetCreator,
    bbox2loc, bbox_iou, loc2bbox)


def test_loc_roundtrip():
    rng = np.random.RandomState(0)
    src = rng.uniform(0, 100, (20, 2))
    src = np.concatenate([src, src + rng.uniform(5, 40, (20, 2))], 1)
    dst = rng.uniform(0, 100, (20, 2))
    dst = np.concatenate([dst, dst + rng.uniform(5, 40, (20, 2))], 1)
    rec = loc2bbox(src, bbox2loc(src, dst))
    np.testing.assert_allclose(rec, dst, rtol=1e-4, atol=1e-3)


def test_anchor_target_creator():
    anchors = np.array([[0, 0, 10, 10], [5, 5, 15, 15],
                        [50, 50, 60, 60], [-5, 0, 5, 10]], np.float32)
    gts = np.array([[0, 0, 10, 10]], np.float32)
    c = AnchorTargetCreator(n_sample=4, rng=np.random.RandomState(0))
    loc, label = c(gts, anchors, (64, 64))
    assert loc.shape == (4, 4) and label.shape == (4,)
    assert label[0] == 1          # exact-match anchor is positive
    assert label[2] == 0          # far anchor negative
    assert label[3] == -1         # outside image -> ignore
    np.testing.assert_allclose(loc[0], 0.0, atol=1e-6)


def test_proposal_creator():
    anchors = np.array([[0, 0, 20, 20], [1, 1, 21, 21],
                        [40, 40, 60, 60]], np.float32)
    loc = np.zeros((3, 4), np.float32)
    score = np.array([0.9, 0.8, 0.7], np.float32)
    pc = ProposalCreator(nms_thresh=0.5, n_test_post_nms=10, min_size=5)
    rois = pc(loc, score, anchors, (64, 64))
    # overlapping pair suppressed to one + the far box
    assert rois.shape == (2, 4)
    np.testing.assert_allclose(rois[0], anchors[0])


def test_proposal_target_creator():
    rois = np.array([[0, 0, 10, 10], [0, 0, 9, 9], [30, 30, 40, 40],
                     [31, 31, 41, 41]], np.float32)
    gts = np.array([[0, 0, 10, 10]], np.float32)
    labels = np.array([3])
    c = ProposalTargetCreator(n_sample=4, pos_ratio=0.5,
                              rng=np.random.RandomState(0))
    sroi, sloc, slab = c(rois, gts, labels)
    assert sroi.shape[1] == 4 and sloc.shape[1] == 4
    assert (slab[:1] == 4).all()  # foreground shifted by +1
    assert (slab[-1:] == 0).all() or (slab == 4).all()


def test_bbox_iou():
    a = np.array([[0, 0, 10, 10]], np.float32)
    b = np.array([[0, 0, 10, 10], [5, 5, 15, 15]], np.float32)
    iou = bbox_iou(a, b)
    np.testing.assert_allclose(iou[0, 0], 1.0, rtol=1e-5)
    np.testing.assert_allclose(iou[0, 1], 25.0 / 175.0, rtol=1e-5)
