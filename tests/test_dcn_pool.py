"""Deformable RoI pooling vs an independent numpy implementation of
the reference CUDA math (``dcn_v2.py:808-935``)."""

import numpy as np
import pytest


def np_deform_roi_pool(feats, rois, offsets, p=7, scale=1.0, s=4,
                       trans_std=0.0, gs=1, output_dim=None):
    """Straight-line numpy transcription of the kernel semantics."""
    n, H, W, C = feats.shape
    output_dim = output_dim or C // (gs * gs)
    R = len(rois)
    out = np.zeros((R, p, p, output_dim), np.float64)
    for r in range(R):
        b = int(rois[r, 0])
        x1 = round(rois[r, 1]) * scale - 0.5
        y1 = round(rois[r, 2]) * scale - 0.5
        x2 = (round(rois[r, 3]) + 1) * scale - 0.5
        y2 = (round(rois[r, 4]) + 1) * scale - 0.5
        rw = max(x2 - x1, 0.1)
        rh = max(y2 - y1, 0.1)
        bw, bh = rw / p, rh / p
        sw, sh = bw / s, bh / s
        for ph in range(p):
            for pw in range(p):
                part_h = int(np.floor(ph / p * p))
                part_w = int(np.floor(pw / p * p))
                tx = ty = 0.0
                if offsets is not None:
                    tx = offsets[r, 0, part_h, part_w] * trans_std
                    ty = offsets[r, 1, part_h, part_w] * trans_std
                ws = x1 + pw * bw + tx * rw
                hs = y1 + ph * bh + ty * rh
                acc = np.zeros(C)
                cnt = 0
                for i in range(s):
                    for j in range(s):
                        w = ws + j * sw
                        h = hs + i * sh
                        if not (-0.5 < w < W - 0.5
                                and -0.5 < h < H - 0.5):
                            continue
                        w = min(max(w, 0.0), W - 1.0)
                        h = min(max(h, 0.0), H - 1.0)
                        w0, h0 = int(w), int(h)
                        w1, h1 = min(w0 + 1, W - 1), min(h0 + 1, H - 1)
                        aw, ah = w - w0, h - h0
                        v = ((feats[b, h0, w0] * (1 - aw)
                              + feats[b, h0, w1] * aw) * (1 - ah)
                             + (feats[b, h1, w0] * (1 - aw)
                                + feats[b, h1, w1] * aw) * ah)
                        acc += v
                        cnt += 1
                pooled = acc / max(cnt, 1)
                if gs == 1:
                    out[r, ph, pw] = pooled[:output_dim]
                else:
                    ghh = int(np.floor(ph / p * gs))
                    gww = int(np.floor(pw / p * gs))
                    for ct in range(output_dim):
                        out[r, ph, pw, ct] = pooled[
                            (ct * gs + ghh) * gs + gww]
    return out


@pytest.fixture()
def data():
    rng = np.random.RandomState(0)
    feats = rng.rand(2, 24, 24, 8).astype(np.float32)
    rois = np.array([[0, 4, 4, 16, 12],
                     [1, 2, 6, 20, 20],
                     [0, 10, 10, 13, 13]], np.float32)
    return feats, rois


def test_matches_numpy_no_trans(data):
    import jax.numpy as jnp

    from rs_detection_tpu.ops.dcn_pool import deform_roi_pooling

    feats, rois = data
    got = np.asarray(deform_roi_pooling(
        jnp.asarray(feats), jnp.asarray(rois), None, output_size=7,
        spatial_scale=0.5, sample_per_part=4))
    want = np_deform_roi_pool(feats, rois, None, p=7, scale=0.5, s=4)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_matches_numpy_with_offsets(data):
    import jax.numpy as jnp

    from rs_detection_tpu.ops.dcn_pool import deform_roi_pooling

    feats, rois = data
    rng = np.random.RandomState(1)
    offsets = rng.randn(3, 2, 7, 7).astype(np.float32)
    got = np.asarray(deform_roi_pooling(
        jnp.asarray(feats), jnp.asarray(rois), jnp.asarray(offsets),
        output_size=7, spatial_scale=0.5, sample_per_part=4,
        trans_std=0.1))
    want = np_deform_roi_pool(feats, rois, offsets, p=7, scale=0.5,
                              s=4, trans_std=0.1)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_position_sensitive_groups(data):
    import jax.numpy as jnp

    from rs_detection_tpu.ops.dcn_pool import deform_roi_pooling

    feats, rois = data  # C=8, gs=2 -> output_dim=2
    got = np.asarray(deform_roi_pooling(
        jnp.asarray(feats), jnp.asarray(rois), None, output_size=4,
        spatial_scale=0.5, group_size=2, sample_per_part=2))
    want = np_deform_roi_pool(feats, rois, None, p=4, scale=0.5, s=2,
                              gs=2)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_dcn_pooling_module(data):
    import jax
    import jax.numpy as jnp

    from rs_detection_tpu.ops.dcn_pool import DCNPooling, \
        deform_roi_pooling

    feats, rois = data
    mod = DCNPooling(spatial_scale=0.5, pooled_size=7, output_dim=8,
                     no_trans=False, trans_std=0.1, deform_fc_dim=32)
    variables = mod.init(jax.random.PRNGKey(0), jnp.asarray(feats),
                         jnp.asarray(rois))
    out = mod.apply(variables, jnp.asarray(feats), jnp.asarray(rois))
    # zero-initialized offset branch: offsets 0, mask sigmoid(0)=0.5
    base = deform_roi_pooling(jnp.asarray(feats), jnp.asarray(rois),
                              None, output_size=7, spatial_scale=0.5,
                              output_dim=8, sample_per_part=4,
                              trans_std=0.1)
    np.testing.assert_allclose(np.asarray(out), np.asarray(base) * 0.5,
                               rtol=1e-5, atol=1e-6)
    # gradients flow to the offset branch
    def loss(v):
        return jnp.sum(mod.apply(v, jnp.asarray(feats),
                                 jnp.asarray(rois)) ** 2)
    g = jax.grad(loss)(variables)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)
