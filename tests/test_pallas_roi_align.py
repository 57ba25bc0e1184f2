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


def test_big_window_tier_exact():
    """Long-aspect rois (extent 30..62 at their level) are exact via
    the [64, 96] big-window pass with NO XLA fallback."""
    rng = np.random.RandomState(9)
    feats = _pyramid(rng)
    a = _rand_rois(rng, 24, 2, tier_a_only=True)
    big = np.array(_rand_rois(rng, 8, 2))
    big[:, 3] = rng.uniform(250, 420, 8)   # elongated: tier-1 extents
    big[:, 4] = rng.uniform(20, 60, 8)
    rois = jnp.concatenate([a, jnp.asarray(big)], 0)
    ref = roi_align_rotated_pyramid(feats, rois, 7, strides=STRIDES)
    got = roi_align_rotated_pyramid_pallas(
        feats, rois, 7, strides=STRIDES, fallback_frac=0.0,
        big_frac=0.5, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)
