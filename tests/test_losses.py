"""Loss unit tests, mirroring the reference test strategy
(``tests/test_models/test_losses``)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rs_detection_tpu.models.losses import (
    EQLv2, EqualizedFocalLoss, FocalLoss, GDLoss, PolyGIoULoss,
    PolyIoULoss, SeesawLoss, SmoothL1Loss, binary_cross_entropy,
    poly_iou_loss, sigmoid_focal_loss, smooth_l1_loss,
    softmax_cross_entropy, xy_wh_r_2_xy_sigma)
from rs_detection_tpu.ops.box_ops import obb2poly

rng = np.random.RandomState(5)


class TestBasicLosses:
    def test_smooth_l1_known(self):
        pred = jnp.array([0.0, 2.0])
        target = jnp.array([0.5, 0.0])
        loss = smooth_l1_loss(pred, target, beta=1.0, reduction="none")
        assert np.allclose(np.asarray(loss), [0.125, 1.5])

    def test_ce_matches_manual(self):
        logits = jnp.asarray(rng.randn(8, 5).astype(np.float32))
        labels = jnp.asarray(rng.randint(0, 5, 8))
        loss = softmax_cross_entropy(logits, labels, reduction="none")
        probs = np.asarray(jax.nn.softmax(logits))
        manual = -np.log(probs[np.arange(8), np.asarray(labels)])
        assert np.allclose(np.asarray(loss), manual, atol=1e-4)

    def test_focal_downweights_easy(self):
        easy = jnp.array([[10.0]])     # confident correct positive
        hard = jnp.array([[0.0]])
        onehot = jnp.array([[1.0]])
        l_easy = sigmoid_focal_loss(easy, onehot, reduction="sum")
        l_hard = sigmoid_focal_loss(hard, onehot, reduction="sum")
        assert float(l_easy) < float(l_hard) / 100

    def test_focal_class_wrapper(self):
        fl = FocalLoss()
        pred = jnp.asarray(rng.randn(6, 4).astype(np.float32))
        labels = jnp.asarray(np.array([0, 1, 2, 3, 4, 0]))  # 0 = bg
        out = fl(pred, labels, weight=jnp.ones(6), avg_factor=4.0)
        assert np.isfinite(float(out))

    def test_bce_weights(self):
        pred = jnp.zeros((4,))
        tgt = jnp.ones((4,))
        w = jnp.array([1.0, 1, 0, 0])
        loss = binary_cross_entropy(pred, tgt, w, avg_factor=2.0)
        assert abs(float(loss) - float(np.log(2))) < 1e-5


class TestPolyIoULoss:
    def test_identical_boxes_zero(self):
        obbs = jnp.asarray(np.array(
            [[50, 50, 20, 10, 0.3], [30, 30, 8, 6, -0.5]], np.float32))
        loss = poly_iou_loss(obbs, obbs, linear=True, reduction="none")
        assert np.allclose(np.asarray(loss), 0.0, atol=1e-2)

    def test_disjoint_high(self):
        a = jnp.asarray(np.array([[10, 10, 5, 5, 0.0]], np.float32))
        b = jnp.asarray(np.array([[100, 100, 5, 5, 0.0]], np.float32))
        loss = poly_iou_loss(a, b, linear=True, reduction="none")
        assert float(loss[0]) > 0.99

    def test_gradients(self):
        a = jnp.asarray(np.array([[50, 50, 20, 10, 0.2]], np.float32))
        b = jnp.asarray(np.array([[52, 51, 18, 11, 0.3]], np.float32))

        g = jax.grad(lambda x: poly_iou_loss(x, b, reduction="sum"))(a)
        assert np.isfinite(np.asarray(g)).all()
        assert np.abs(np.asarray(g)).sum() > 0

    def test_giou(self):
        a = jnp.asarray(np.array([[10, 10, 5, 5, 0.0]], np.float32))
        loss_same = PolyGIoULoss()(a, a)
        assert float(loss_same) < 1e-2


class TestGaussianLosses:
    def test_sigma_conversion(self):
        box = jnp.asarray(np.array([[0, 0, 4, 2, 0.0]], np.float32))
        xy, sigma = xy_wh_r_2_xy_sigma(box)
        assert np.allclose(np.asarray(sigma)[0], [[4, 0], [0, 1]],
                           atol=1e-5)
        # rotated 90deg -> swapped
        box90 = jnp.asarray(np.array([[0, 0, 4, 2, np.pi / 2]],
                                     np.float32))
        _, s90 = xy_wh_r_2_xy_sigma(box90)
        assert np.allclose(np.asarray(s90)[0], [[1, 0], [0, 4]],
                           atol=1e-4)

    @pytest.mark.parametrize("lt", ["gwd", "kld"])
    def test_identical_near_zero(self, lt):
        boxes = jnp.asarray(np.array(
            [[50, 50, 20, 10, 0.3]], np.float32))
        loss = GDLoss(lt, reduction="none")(boxes, boxes)
        assert float(np.asarray(loss).sum()) < 0.1

    @pytest.mark.parametrize("lt", ["gwd", "kld"])
    def test_monotone_with_distance(self, lt):
        a = jnp.asarray(np.array([[50, 50, 20, 10, 0.0]], np.float32))
        near = jnp.asarray(np.array([[52, 50, 20, 10, 0.0]], np.float32))
        far = jnp.asarray(np.array([[80, 50, 20, 10, 0.0]], np.float32))
        fn = GDLoss(lt, reduction="sum")
        assert float(fn(a, near)) < float(fn(a, far))

    def test_kfiou(self):
        a = jnp.asarray(np.array([[0, 0, 0, 0, 0]], np.float32))
        dec = jnp.asarray(np.array([[50, 50, 20, 10, 0.3]], np.float32))
        loss = GDLoss("kfiou", reduction="sum")(
            a, a, pred_decode=dec, targets_decode=dec)
        # KFIoU saturates at 1/3 for identical boxes -> loss 2/3
        assert abs(float(loss) - 2.0 / 3.0) < 1e-2

    def test_gwd_grads(self):
        a = jnp.asarray(np.array([[50, 50, 20, 10, 0.2]], np.float32))
        b = jnp.asarray(np.array([[55, 48, 22, 9, 0.4]], np.float32))
        g = jax.grad(lambda x: float(0) + GDLoss("gwd", reduction="sum")
                     (x, b))(a)
        assert np.isfinite(np.asarray(g)).all()


class TestLongTail:
    def test_seesaw_state_updates(self):
        loss_fn = SeesawLoss(num_classes=5)
        state = loss_fn.init_state()
        cls_score = jnp.asarray(rng.randn(10, 7).astype(np.float32))
        labels = jnp.asarray(rng.randint(0, 6, 10))
        loss, new_state = loss_fn(cls_score, labels, state)
        assert np.isfinite(float(loss))
        assert float(new_state.cum_samples.sum()) == 10

    def test_eqlv2(self):
        loss_fn = EQLv2(num_classes=5)
        state = loss_fn.init_state()
        cls_score = jnp.asarray(rng.randn(8, 6).astype(np.float32))
        labels = jnp.asarray(rng.randint(0, 6, 8))
        loss, new_state = loss_fn(cls_score, labels, state)
        assert np.isfinite(float(loss))
        assert (np.asarray(new_state.pos_grad)
                >= np.asarray(state.pos_grad) - 1e-9).all()

    def test_efl(self):
        loss_fn = EqualizedFocalLoss(num_classes=6)
        state = loss_fn.init_state()
        cls_score = jnp.asarray(rng.randn(8, 6).astype(np.float32))
        labels = jnp.asarray(rng.randint(0, 7, 8))  # 6 = bg
        loss, new_state = loss_fn(cls_score, labels, state)
        assert np.isfinite(float(loss))
        assert np.isfinite(np.asarray(new_state.pos_neg)).all()


class TestLongTailVariants:
    def test_eqlv2_impr_state_and_loss(self):
        import jax
        import jax.numpy as jnp

        from rs_detection_tpu.models.losses.long_tail import EQLv2Impr

        c = 6
        loss_fn = EQLv2Impr(num_classes=c)
        state = loss_fn.init_state()
        rng = np.random.RandomState(0)
        scores = jnp.asarray(rng.randn(16, c + 1), jnp.float32)
        labels = jnp.asarray(rng.randint(0, c + 1, 16))
        loss, new_state = loss_fn(scores, labels, state)
        assert np.isfinite(float(loss)) and float(loss) > 0
        # grad statistics accumulate and acc_loss moves
        assert (np.asarray(new_state.pos_grad)
                >= np.asarray(state.pos_grad)).all()
        assert float(new_state.acc_loss.sum()) > float(
            state.acc_loss.sum())
        # initial state gives pos_w == neg_w == 1 (reference: pos_neg
        # starts at 100 so the map saturates at 1)
        nw = loss_fn._map_func(state.pos_grad / (state.neg_grad + 1e-10))
        np.testing.assert_allclose(np.asarray(nw), 1.0, atol=1e-6)
        # differentiable
        g = jax.grad(lambda s: loss_fn(s, labels, state)[0])(scores)
        assert np.isfinite(np.asarray(g)).all()

    def test_eflv1_tracks_all_channels(self):
        import jax.numpy as jnp

        from rs_detection_tpu.models.losses.long_tail import \
            EqualizedFocalLossV1

        c = 5
        loss_fn = EqualizedFocalLossV1(num_classes=c)
        state = loss_fn.init_state()
        assert state.pos_grad.shape == (c + 1,)   # incl. objectness
        rng = np.random.RandomState(1)
        scores = jnp.asarray(rng.randn(8, c + 1), jnp.float32)
        labels = jnp.asarray(rng.randint(0, c + 1, 8))
        loss, ns = loss_fn(scores, labels, state)
        assert np.isfinite(float(loss))
        assert float(ns.pos_grad.sum()) > 0
        act = loss_fn.get_activation(scores)
        assert act.shape == scores.shape
        assert (np.asarray(act) <= 1).all()
