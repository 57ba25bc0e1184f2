"""Pallas pyramid RoIAlign vs the XLA gather path (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rs_detection_tpu.ops.pallas_roi_align import (
    _EXTENT, roi_align_rotated_pyramid_pallas)
from rs_detection_tpu.ops.roi_align import roi_align_rotated_pyramid

STRIDES = (4, 8, 16, 32)


def _pyramid(rng, n=2, c=32, base=128):
    return [jnp.asarray(rng.randn(n, base // s * 4, base // s * 4, c)
                        .astype(np.float32)) for s in STRIDES]


def _rand_rois(rng, r, n, img=512, tier_a_only=False):
    b = rng.randint(0, n, r).astype(np.float32)
    cx = rng.uniform(0, img, r)
    cy = rng.uniform(0, img, r)
    if tier_a_only:
        # comfortably in-window at every level: aspect ~1, moderate size
        w = rng.uniform(16, 60, r)
        h = w * rng.uniform(0.7, 1.4, r)
    else:
        w = rng.uniform(4, 400, r)
        h = rng.uniform(4, 400, r)
    t = rng.uniform(-np.pi / 2, np.pi / 2, r)
    return jnp.asarray(np.stack([b, cx, cy, w, h, t], 1).astype(np.float32))


def test_tier_a_matches_xla_path():
    rng = np.random.RandomState(0)
    feats = _pyramid(rng)
    rois = _rand_rois(rng, 24, 2, tier_a_only=True)
    ref = roi_align_rotated_pyramid(feats, rois, 7, strides=STRIDES)
    got = roi_align_rotated_pyramid_pallas(
        feats, rois, 7, strides=STRIDES, fallback_frac=0.0,
        interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_mixed_tiers_full_fallback_exact():
    rng = np.random.RandomState(1)
    feats = _pyramid(rng)
    rois = _rand_rois(rng, 20, 2)
    ref = roi_align_rotated_pyramid(feats, rois, 7, strides=STRIDES)
    got = roi_align_rotated_pyramid_pallas(
        feats, rois, 7, strides=STRIDES, fallback_frac=1.0,
        interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_partial_fallback_covers_tier_b():
    """With capacity >= actual tier-B count, everything is exact."""
    rng = np.random.RandomState(2)
    feats = _pyramid(rng)
    a = _rand_rois(rng, 28, 2, tier_a_only=True)
    big = np.array(_rand_rois(rng, 4, 2))
    big[:, 3] = 380.0   # elongated -> tier B at its level
    big[:, 4] = 40.0
    rois = jnp.concatenate([a, jnp.asarray(big)], 0)
    ref = roi_align_rotated_pyramid(feats, rois, 7, strides=STRIDES)
    got = roi_align_rotated_pyramid_pallas(
        feats, rois, 7, strides=STRIDES, fallback_frac=0.25,
        interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_oob_and_border_rois():
    rng = np.random.RandomState(3)
    feats = _pyramid(rng)
    rois = np.array(_rand_rois(rng, 8, 2, tier_a_only=True))
    rois[0, 1:3] = [2.0, 2.0]          # hugging the origin
    rois[1, 1:3] = [510.0, 510.0]      # bottom-right corner
    rois[2, 1:3] = [-20.0, 256.0]      # partially outside
    rois[3, 1:3] = [256.0, 530.0]
    rois = jnp.asarray(rois)
    ref = roi_align_rotated_pyramid(feats, rois, 7, strides=STRIDES)
    got = roi_align_rotated_pyramid_pallas(
        feats, rois, 7, strides=STRIDES, fallback_frac=0.0,
        interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_dynamic_fallback_small_bucket_exact():
    """Pay-per-use fallback: with frac=1.0 but only 2 tier>=1 rois,
    the switch selects a small capacity bucket — and every roi is
    still exact vs the XLA path (the bucket covers all tier-B rois,
    and tier-A rois recomputed by the tail are exact either way)."""
    rng = np.random.RandomState(21)
    feats = _pyramid(rng)
    a = _rand_rois(rng, 28, 2, tier_a_only=True)
    big = np.array(_rand_rois(rng, 2, 2))
    big[:, 3] = 380.0
    big[:, 4] = 40.0
    rois = jnp.concatenate([a, jnp.asarray(big)], 0)
    ref = roi_align_rotated_pyramid(feats, rois, 7, strides=STRIDES)
    got = roi_align_rotated_pyramid_pallas(
        feats, rois, 7, strides=STRIDES, fallback_frac=1.0,
        interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_dynamic_fallback_zero_bucket_matches_windowed():
    """All tier-A rois with a nonzero fallback budget: n_need == 0
    selects the zero-capacity branch, so the output must be bitwise
    the windowed kernel's result (the frac=0.0 run)."""
    rng = np.random.RandomState(22)
    feats = _pyramid(rng)
    rois = _rand_rois(rng, 24, 2, tier_a_only=True)
    got_dyn = roi_align_rotated_pyramid_pallas(
        feats, rois, 7, strides=STRIDES, fallback_frac=0.5,
        interpret=True)
    got_win = roi_align_rotated_pyramid_pallas(
        feats, rois, 7, strides=STRIDES, fallback_frac=0.0,
        interpret=True)
    np.testing.assert_array_equal(np.asarray(got_dyn),
                                  np.asarray(got_win))


def test_dynamic_fallback_matches_static(monkeypatch):
    """RS_ROI_FB_DYNAMIC=0 (single static bucket) and the default
    bucketed path agree exactly when the selected bucket covers all
    tier>=1 rois. The flag is read at trace time, so flip it across a
    cache clear."""
    rng = np.random.RandomState(23)
    feats = _pyramid(rng)
    a = _rand_rois(rng, 26, 2, tier_a_only=True)
    big = np.array(_rand_rois(rng, 6, 2))
    big[:, 3] = 380.0
    big[:, 4] = 40.0
    rois = jnp.concatenate([a, jnp.asarray(big)], 0)

    jax.clear_caches()
    got_dyn = np.asarray(roi_align_rotated_pyramid_pallas(
        feats, rois, 7, strides=STRIDES, fallback_frac=0.5,
        interpret=True))
    monkeypatch.setenv("RS_ROI_FB_DYNAMIC", "0")
    jax.clear_caches()
    got_sta = np.asarray(roi_align_rotated_pyramid_pallas(
        feats, rois, 7, strides=STRIDES, fallback_frac=0.5,
        interpret=True))
    jax.clear_caches()
    np.testing.assert_allclose(got_dyn, got_sta, rtol=2e-4, atol=2e-4)


def test_grad_flows_via_xla_vjp():
    rng = np.random.RandomState(4)
    feats = _pyramid(rng, n=1, c=8, base=64)
    rois = _rand_rois(rng, 6, 1, img=256, tier_a_only=True)

    def loss_pallas(fs):
        return roi_align_rotated_pyramid_pallas(
            fs, rois, 7, strides=STRIDES, fallback_frac=0.0,
            interpret=True).sum()

    def loss_xla(fs):
        return roi_align_rotated_pyramid(
            fs, rois, 7, strides=STRIDES).sum()

    g_p = jax.grad(loss_pallas)(feats)
    g_x = jax.grad(loss_xla)(feats)
    for gp, gx in zip(g_p, g_x):
        np.testing.assert_allclose(np.asarray(gp), np.asarray(gx),
                                   rtol=1e-4, atol=1e-4)


def test_bf16_features():
    rng = np.random.RandomState(5)
    feats = [f.astype(jnp.bfloat16) for f in _pyramid(rng)]
    rois = _rand_rois(rng, 12, 2, tier_a_only=True)
    ref = roi_align_rotated_pyramid(feats, rois, 7, strides=STRIDES)
    got = roi_align_rotated_pyramid_pallas(
        feats, rois, 7, strides=STRIDES, fallback_frac=0.0,
        interpret=True)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32),
        rtol=0.05, atol=0.05)


@pytest.mark.slow
def test_shard_map_composition():
    """The kernel composes with data-parallel shard_map (the
    multi-chip eval path): sharded output == the single-device result
    on the virtual 8-device mesh."""
    from jax.experimental.shard_map import shard_map
    from jax.sharding import Mesh, PartitionSpec as P

    rng = np.random.RandomState(7)
    n_dev = 8
    feats = _pyramid(rng, n=n_dev, c=16, base=64)
    r_per = 4
    rois_list = []
    for d in range(n_dev):
        r = np.array(_rand_rois(rng, r_per, 1, img=256, tier_a_only=True))
        r[:, 0] = d   # batch index = device-local image
        rois_list.append(r)
    rois = jnp.asarray(np.concatenate(rois_list, 0))

    ref = roi_align_rotated_pyramid_pallas(
        feats, rois, 7, strides=STRIDES, fallback_frac=0.0,
        interpret=True)

    mesh = Mesh(np.asarray(jax.devices()[:n_dev]), ("data",))

    def local(feats, rois):
        # rois carry global batch indices; remap to the shard's frame
        # (one image per shard here)
        rois = rois.at[:, 0].set(0.0)
        return roi_align_rotated_pyramid_pallas(
            list(feats), rois, 7, strides=STRIDES, fallback_frac=0.0,
            interpret=True)

    mapped = shard_map(
        local, mesh=mesh,
        in_specs=(P("data"), P("data")), out_specs=P("data"),
        check_rep=False)
    with mesh:
        got = jax.jit(mapped)(tuple(feats), rois)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=2e-4, atol=2e-4)


def _tier1_rois(rng, r, n, img=512):
    """Rois whose per-axis sample extent lands in (30, 38] at their
    level — the big-window tier. Two populations, mirroring the
    round-5 fb_need probe finding: rotated near-squares at the top of
    a level bucket (the dominant case) and moderate-aspect boxes."""
    b = rng.randint(0, n, r).astype(np.float32)
    cx = rng.uniform(60, img - 60, r)
    cy = rng.uniform(60, img - 60, r)
    sq = rng.rand(r) < 0.5
    # near-square at 45 deg: scale=h in [90, 106) -> lvl 0, rw=rh=h/4
    # in [22.5, 26.5), extent = rw*sqrt(2) in (31.8, 37.5)
    h_sq = rng.uniform(90, 106, r)
    # aspect-4 at ~0 deg: h in [31, 38) -> lvl 0 (scale=2h), rw=h
    h_ar = rng.uniform(31, 38, r)
    w = np.where(sq, h_sq, 4.0 * h_ar)
    h = np.where(sq, h_sq, h_ar)
    t = np.where(sq, np.pi / 4, rng.uniform(-0.15, 0.15, r))
    return jnp.asarray(
        np.stack([b, cx, cy, w, h, t], 1).astype(np.float32))


@pytest.mark.slow
def test_big_window_tier_exact():
    """Tier-1 rois (extent 30..38 at their level) are exact via the
    [40, 64] big-window pass with NO XLA fallback."""
    rng = np.random.RandomState(9)
    feats = _pyramid(rng)
    a = _rand_rois(rng, 24, 2, tier_a_only=True)
    big = _tier1_rois(rng, 8, 2)
    rois = jnp.concatenate([a, big], 0)
    ref = roi_align_rotated_pyramid(feats, rois, 7, strides=STRIDES)
    got = roi_align_rotated_pyramid_pallas(
        feats, rois, 7, strides=STRIDES, fallback_frac=0.0,
        big_frac=0.5, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.slow
def test_big_window_full_split_exact():
    """big_frac=1.0: the static split (round 5) skips the std pass
    entirely — every roi is served by the big-window pass alone."""
    rng = np.random.RandomState(13)
    feats = _pyramid(rng)
    a = _rand_rois(rng, 12, 2, tier_a_only=True)
    big = _tier1_rois(rng, 4, 2)
    rois = jnp.concatenate([a, big], 0)
    ref = roi_align_rotated_pyramid(feats, rois, 7, strides=STRIDES)
    got = roi_align_rotated_pyramid_pallas(
        feats, rois, 7, strides=STRIDES, fallback_frac=0.0,
        big_frac=1.0, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.slow
def test_big_window_plus_tier2_tail_exact():
    """big_frac > 0 AND fallback_frac > 0 with tier-2 (hairline) rois
    present: the XLA exact tail now sizes itself by the tier-2 count
    only (tier-1 handled exactly by the big-window pass), and the
    whole mix must still match the XLA path exactly."""
    rng = np.random.RandomState(11)
    feats = _pyramid(rng)
    a = _rand_rois(rng, 20, 2, tier_a_only=True)
    big = _tier1_rois(rng, 6, 2)
    hair = np.array(_rand_rois(rng, 4, 2))
    hair[:, 3] = rng.uniform(900, 1600, 4)  # tier-2: extent > 38
    hair[:, 4] = rng.uniform(4, 10, 4)
    hair[:, 5] = 0.0
    rois = jnp.concatenate([a, big, jnp.asarray(hair)], 0)
    ref = roi_align_rotated_pyramid(feats, rois, 7, strides=STRIDES)
    got = roi_align_rotated_pyramid_pallas(
        feats, rois, 7, strides=STRIDES, fallback_frac=0.5,
        big_frac=0.4, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.slow
def test_big_window_tier1_overflow_exact():
    """More tier-1 rois than the big suffix holds (big_frac set below
    the actual tier-1 fraction): the overflow guard (round 5) must
    expand the exact XLA tail to the whole tier>=1 block, so the
    overflow rois do NOT silently go through the std pass with
    clamped windows."""
    rng = np.random.RandomState(17)
    feats = _pyramid(rng)
    a = _rand_rois(rng, 16, 2, tier_a_only=True)
    big = _tier1_rois(rng, 12, 2)
    rois = jnp.concatenate([a, big], 0)          # r=28, n1=12
    ref = roi_align_rotated_pyramid(feats, rois, 7, strides=STRIDES)
    # n_big = round(28*0.15) = 4 < n1 = 12 -> overflow; fallback caps
    # [0,4,7,14] select 14 >= 12, covering the whole tier-1 block
    got = roi_align_rotated_pyramid_pallas(
        feats, rois, 7, strides=STRIDES, fallback_frac=0.5,
        big_frac=0.15, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


class TestPallasBackward:
    """The A^T window-scatter backward (VERDICT round-2 #3): exact
    adjoint of the window forward, f32-checked against the XLA path's
    vjp (for tier-A rois the two forwards are identical, so the
    adjoints must match)."""

    def _grads(self, feats, rois, fallback_frac, via_pallas):
        def loss_pallas(fs):
            out = roi_align_rotated_pyramid_pallas(
                fs, rois, 7, strides=STRIDES,
                fallback_frac=fallback_frac, interpret=True)
            return jnp.sum(out * (1.0 + 0.01 * jnp.arange(out.size)
                                  .reshape(out.shape)))

        def loss_xla(fs):
            out = roi_align_rotated_pyramid(
                fs, rois, 7, strides=STRIDES)
            return jnp.sum(out * (1.0 + 0.01 * jnp.arange(out.size)
                                  .reshape(out.shape)))

        return jax.grad(loss_pallas if via_pallas else loss_xla)(feats)

    def test_matches_xla_vjp_tier_a(self):
        rng = np.random.RandomState(11)
        feats = _pyramid(rng, n=3, c=32)
        rois = _rand_rois(rng, 23, 3, img=400, tier_a_only=True)
        gp = self._grads(feats, rois, 0.25, True)
        gx = self._grads(feats, rois, 0.25, False)
        for a, b in zip(gp, gx):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-4, atol=2e-4)

    def test_matches_xla_vjp_no_fallback(self):
        rng = np.random.RandomState(12)
        feats = _pyramid(rng, n=2, c=32)
        rois = _rand_rois(rng, 9, 2, img=400, tier_a_only=True)
        gp = self._grads(feats, rois, 0.0, True)
        gx = self._grads(feats, rois, 0.0, False)
        for a, b in zip(gp, gx):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-4, atol=2e-4)

    def test_mixed_tiers_dot_check(self):
        """For arbitrary rois (incl. clamped oversize ones) the
        Pallas backward must be the true adjoint of the Pallas
        FORWARD: <g, f(x+dx)> - <g, f(x)> == <vjp(g), dx> for the
        linear-in-features op."""
        rng = np.random.RandomState(13)
        feats = _pyramid(rng, n=2, c=32)
        rois = _rand_rois(rng, 16, 2, img=400)

        def f(fs):
            return roi_align_rotated_pyramid_pallas(
                fs, rois, 7, strides=STRIDES, fallback_frac=0.125,
                interpret=True)

        g = jnp.asarray(rng.randn(*f(feats).shape).astype(np.float32))
        _, vjp = jax.vjp(f, feats)
        (d_feats,) = vjp(g)
        dx = [jnp.asarray(rng.randn(*x.shape).astype(np.float32))
              for x in feats]
        lhs = float(jnp.sum(g * (f([x + 1e-2 * d for x, d
                                    in zip(feats, dx)]) - f(feats))))
        rhs = 1e-2 * float(sum(jnp.sum(a * b)
                               for a, b in zip(d_feats, dx)))
        # the op is linear in features, so this is exact up to f32
        # accumulation noise
        assert abs(lhs - rhs) / (abs(rhs) + 1e-6) < 5e-3, (lhs, rhs)

    def test_dynamic_fallback_bwd_adjoint(self):
        """Adjoint dot-check through the pay-per-use switch: the
        backward must select the SAME bucket as the forward so the
        vjp subset matches the forward's overwrite exactly. Mixed
        tiers with a large budget so n_need << n_fb (a small bucket
        is selected in both directions)."""
        rng = np.random.RandomState(24)
        feats = _pyramid(rng, n=2, c=32)
        a = _rand_rois(rng, 24, 2, img=400, tier_a_only=True)
        big = np.array(_rand_rois(rng, 3, 2, img=400))
        big[:, 3] = 380.0
        big[:, 4] = 40.0
        rois = jnp.concatenate([a, jnp.asarray(big)], 0)

        def f(fs):
            return roi_align_rotated_pyramid_pallas(
                fs, rois, 7, strides=STRIDES, fallback_frac=1.0,
                interpret=True)

        g = jnp.asarray(rng.randn(*f(feats).shape).astype(np.float32))
        _, vjp = jax.vjp(f, feats)
        (d_feats,) = vjp(g)
        dx = [jnp.asarray(rng.randn(*x.shape).astype(np.float32))
              for x in feats]
        lhs = float(jnp.sum(g * (f([x + 1e-2 * d for x, d
                                    in zip(feats, dx)]) - f(feats))))
        rhs = 1e-2 * float(sum(jnp.sum(a_ * b_)
                               for a_, b_ in zip(d_feats, dx)))
        assert abs(lhs - rhs) / (abs(rhs) + 1e-6) < 5e-3, (lhs, rhs)

    def test_d_rois_zero_and_env_fallback(self, monkeypatch):
        rng = np.random.RandomState(14)
        feats = _pyramid(rng, n=2, c=32)
        rois = _rand_rois(rng, 8, 2, img=400, tier_a_only=True)

        def f(fs, rr):
            return jnp.sum(roi_align_rotated_pyramid_pallas(
                fs, rr, 7, strides=STRIDES, fallback_frac=0.0,
                interpret=True))

        _, d_rois = jax.grad(f, argnums=(0, 1))(feats, rois)
        assert float(jnp.abs(d_rois).sum()) == 0.0
        # opt-out env flag restores the XLA full vjp (nonzero d_rois)
        monkeypatch.setenv("RS_ROI_PALLAS_BWD", "0")
        _, d_rois_x = jax.grad(f, argnums=(0, 1))(feats, rois)
        assert float(jnp.abs(d_rois_x).sum()) > 0.0

    @pytest.mark.slow
    def test_train_step_grads_through_pallas_extractor(self):
        """Full detector loss + grad with the extractor forced to the
        Pallas path (interpret): finite, nonzero grads reach the
        backbone — the RS_ROI_TRAIN_PALLAS=1 training configuration."""
        import dataclasses
        import os
        import sys
        sys.path.insert(0, os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))))
        import __graft_entry__ as ge

        model = ge._flagship(tiny=True)
        head = model.bbox_head
        extr = dict(head.bbox_roi_extractor or {})
        extr["impl"] = "pallas"
        model = dataclasses.replace(
            model, bbox_head=dataclasses.replace(
                head, bbox_roi_extractor=extr))

        b, img = 2, 64
        rng = np.random.RandomState(5)
        images = jnp.asarray(rng.rand(b, img, img, 3).astype(np.float32))
        targets = ge._dummy_targets(b, img)
        variables = model.init(
            {"params": jax.random.PRNGKey(0),
             "sampler": jax.random.PRNGKey(1)}, images, targets)

        def loss_fn(params):
            out = model.apply(
                {**variables, "params": params}, images, targets,
                method=model.loss,
                rngs={"sampler": jax.random.PRNGKey(2)},
                mutable=["batch_stats", "loss_state"])
            losses = out[0] if isinstance(out, tuple) else out
            return sum(v.sum() for k, v in losses.items()
                       if "loss" in k)

        grads = jax.grad(loss_fn)(variables["params"])
        leaves = jax.tree_util.tree_leaves(grads)
        assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
        bb = grads["backbone"]
        total = sum(float(jnp.abs(l).sum())
                    for l in jax.tree_util.tree_leaves(bb))
        assert total > 0.0
