"""R3Det FeatureRefine torch parity.

Completes the cross-framework parity harness over the remaining
resampling op: the reference inline-CUDA FR kernel
(``python/jdet/ops/fr.py:115-165`` forward, ``:60-112`` bilinear with
border clamps) is reimplemented here in torch, element-for-element —
including its quirk that ``best_bboxes[..., 0]`` is read as the *y*
center and ``[..., 1]`` as *x* (fr.py:133-135) — and compared against
``rs_detection_tpu.ops.fr.feature_refine`` (which takes plain
(cx, cy, w, h, theta) boxes) at f32 for points=1 and points=5, on
values and on feature gradients (the reference backward writes only
``bottom_diff``; box gradients are structurally absent — our R3Det
applies ``stop_gradient`` before the decode, ``networks/r3det.py:203``).
"""

from __future__ import annotations

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from rs_detection_tpu.ops.fr import feature_refine


def _t_bilinear(feat, y, x):
    """Reference bilinear_interpolate (fr.py:40-67): zero outside
    (-1, H) x (-1, W); low-side clamp to 0; high-side collapse to the
    last pixel. feat: [H, W]; y, x: arbitrary matching shape."""
    h, w = feat.shape
    oob = (y < -1.0) | (y > h) | (x < -1.0) | (x > w)
    y = y.clamp(min=0.0)
    x = x.clamp(min=0.0)
    y_low = y.long()
    x_low = x.long()
    yc = y_low >= h - 1
    xc = x_low >= w - 1
    y_low = torch.where(yc, torch.full_like(y_low, h - 1), y_low)
    x_low = torch.where(xc, torch.full_like(x_low, w - 1), x_low)
    y_high = torch.where(yc, y_low, y_low + 1)
    x_high = torch.where(xc, x_low, x_low + 1)
    y = torch.where(yc, y_low.to(y.dtype), y)
    x = torch.where(xc, x_low.to(x.dtype), x)
    ly = y - y_low.to(y.dtype)
    lx = x - x_low.to(x.dtype)
    hy = 1.0 - ly
    hx = 1.0 - lx
    v1 = feat[y_low, x_low]
    v2 = feat[y_low, x_high]
    v3 = feat[y_high, x_low]
    v4 = feat[y_high, x_high]
    out = hy * hx * v1 + hy * lx * v2 + ly * hx * v3 + ly * lx * v4
    return torch.where(oob, torch.zeros_like(out), out)


def _t_feature_refine(features, best_bboxes_yx, spatial_scale, points):
    """Reference feature_refine_forward_kernel, vectorized.

    features: [N, C, H, W]; best_bboxes_yx: [N, H, W, 5] with the
    reference's (y, x, w, h, a) buffer order at the kernel boundary.
    """
    n, c, h, w = features.shape
    roi_y = best_bboxes_yx[..., 0] * spatial_scale
    roi_x = best_bboxes_yx[..., 1] * spatial_scale
    pxs = [roi_x]
    pys = [roi_y]
    if points > 1:
        w_2 = best_bboxes_yx[..., 2] * spatial_scale / 2
        h_2 = best_bboxes_yx[..., 3] * spatial_scale / 2
        a = best_bboxes_yx[..., 4]
        cosa, sina = torch.cos(a), torch.sin(a)
        wx, wy = cosa * w_2, sina * w_2
        hx, hy = -sina * h_2, cosa * h_2
        # fr.py:148-151 corner order
        pxs += [roi_x + wx + hx, roi_x - wx + hx,
                roi_x - wx - hx, roi_x + wx - hx]
        pys += [roi_y + wy + hy, roi_y - wy + hy,
                roi_y - wy - hy, roi_y + wy - hy]
    out = features.clone()
    for img in range(n):
        for ch in range(c):
            acc = torch.zeros(h, w, dtype=features.dtype)
            for px, py in zip(pxs, pys):
                acc = acc + _t_bilinear(features[img, ch], py[img],
                                        px[img])
            out[img, ch] = out[img, ch] + acc
    return out


def _case(seed=0, n=2, h=9, w=11, c=3):
    rng = np.random.RandomState(seed)
    feats = rng.randn(n, h, w, c).astype(np.float32)
    # centers spanning in-bounds, border band (-1, 0], clamped-edge and
    # fully out-of-bounds regions; sizes large enough that points=5
    # corners also leave the map
    cx = rng.uniform(-3.0, w + 3.0, size=(n, h, w)).astype(np.float32)
    cy = rng.uniform(-3.0, h + 3.0, size=(n, h, w)).astype(np.float32)
    bw = rng.uniform(0.5, 12.0, size=(n, h, w)).astype(np.float32)
    bh = rng.uniform(0.5, 12.0, size=(n, h, w)).astype(np.float32)
    ang = rng.uniform(-np.pi, np.pi, size=(n, h, w)).astype(np.float32)
    boxes = np.stack([cx, cy, bw, bh, ang], axis=-1)
    return feats, boxes


@pytest.mark.parametrize("points", [1, 5])
@pytest.mark.parametrize("scale", [1.0, 0.5])
def test_fr_forward_parity(points, scale):
    feats, boxes = _case(seed=points * 7 + int(scale * 2))
    ours = np.asarray(feature_refine(
        jnp.asarray(feats), jnp.asarray(boxes), scale, points=points))

    t_feats = torch.from_numpy(feats).permute(0, 3, 1, 2).contiguous()
    boxes_yx = boxes[..., [1, 0, 2, 3, 4]]  # reference (y, x, w, h, a)
    t_out = _t_feature_refine(t_feats, torch.from_numpy(boxes_yx),
                              scale, points)
    ref = t_out.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("points", [1, 5])
def test_fr_feature_grad_parity(points):
    feats, boxes = _case(seed=41 + points, n=1, h=7, w=8, c=2)
    scale = 1.0

    def scalar(f):
        out = feature_refine(f, jnp.asarray(boxes), scale, points=points)
        # weighted sum so the gradient is non-uniform
        wgt = jnp.arange(out.size, dtype=jnp.float32).reshape(out.shape)
        return jnp.sum(out * wgt)

    g_ours = np.asarray(jax.grad(scalar)(jnp.asarray(feats)))

    t_feats = torch.from_numpy(feats).permute(0, 3, 1, 2).contiguous()
    t_feats.requires_grad_(True)
    boxes_yx = boxes[..., [1, 0, 2, 3, 4]]
    t_out = _t_feature_refine(t_feats, torch.from_numpy(boxes_yx),
                              scale, points)
    out_nhwc = t_out.permute(0, 2, 3, 1)
    wgt = torch.arange(out_nhwc.numel(),
                       dtype=torch.float32).reshape(out_nhwc.shape)
    (out_nhwc * wgt).sum().backward()
    g_ref = t_feats.grad.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(g_ours, g_ref, rtol=1e-4, atol=1e-4)
