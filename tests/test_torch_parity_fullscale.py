"""FULL-SCALE cross-framework parity for the flagship (VERDICT-r4 #3).

Every other torch-parity suite instantiates 16-32-channel miniatures;
scale-dependent defects (reduction accumulation over 27-block VAN-b3
depth, layout conversion at C=320, converter naming drift at real
trees) are invisible there. This builds the REAL flagship dims — VAN-b3
(embed 64/128/320/512, depths 3/5/27/3, mlp ratios 8/8/4/4) + FPN-256 +
7-anchor OrientedRPN + OrientedHead(1024 fc) — in torch, converts the
torch ``state_dict`` through ``torch_state_to_flax``, runs one 512^2
tile in f32 through both frameworks, and requires stage activations,
RPN logits and RoI-head outputs to match.

Reference analogue: ``python/jdet/utils/check_diff.py:6-41`` ran at
real scale against full model pickles; the model-zoo mAPs it guarded
are ``JDet_README.md:98-110``.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

from test_torch_parity import (TFPN, TNorm, TOrientedRPN,  # noqa: E402
                               TPatchEmbed, TVANBlock, _convert,
                               _nontrivial_init,
                               _t_rroi_align_pyramid)

pytestmark = pytest.mark.slow

EMBED = (64, 128, 320, 512)
RATIOS = (8, 8, 4, 4)
DEPTHS = (3, 5, 27, 3)


class TVANFull(tnn.Module):
    """4-stage VAN-b3 twin with flax-matching parameter names."""

    def __init__(self):
        super().__init__()
        cin = 3
        for i, (dim, depth) in enumerate(zip(EMBED, DEPTHS)):
            setattr(self, f"patch_embed{i+1}",
                    TPatchEmbed(cin, dim, 7 if i == 0 else 3,
                                4 if i == 0 else 2))
            for j in range(depth):
                setattr(self, f"block{i+1}_{j}",
                        TVANBlock(dim, RATIOS[i]))
            setattr(self, f"norm{i+1}", tnn.LayerNorm(dim, eps=1e-6))
            cin = dim

    def forward(self, x):
        outs = []
        for i, depth in enumerate(DEPTHS):
            x = getattr(self, f"patch_embed{i+1}")(x)
            for j in range(depth):
                x = getattr(self, f"block{i+1}_{j}")(x)
            xn = getattr(self, f"norm{i+1}")(
                x.permute(0, 2, 3, 1))            # NHWC LN
            outs.append(xn)
            x = xn.permute(0, 3, 1, 2).contiguous()
        return outs


class TRoIHeadFull(tnn.Module):
    """OrientedHead fc stack at flagship dims (2 shared 1024 fcs)."""

    def __init__(self, c=256, p=7, hidden=1024, num_classes=10):
        super().__init__()
        self.shared_fc0 = tnn.Linear(c * p * p, hidden)
        self.shared_fc1 = tnn.Linear(hidden, hidden)
        self.fc_cls = tnn.Linear(hidden, num_classes + 1)
        self.fc_reg = tnn.Linear(hidden, 5)   # reg_class_agnostic

    def forward(self, pooled_nchw):
        x = pooled_nchw.flatten(1)
        x = tnn.functional.relu(self.shared_fc0(x))
        x = tnn.functional.relu(self.shared_fc1(x))
        return self.fc_cls(x), self.fc_reg(x)


def _stat(name, a):
    a = np.asarray(a, np.float32)
    return (f"{name}: max|x| {np.abs(a).max():.3e} "
            f"mean|x| {np.abs(a).mean():.3e}")


def test_flagship_fullscale_forward_parity():
    """One 512^2 f32 tile through the real-dim flagship in both
    frameworks; activations compared at every stage boundary."""
    import jax

    from rs_detection_tpu.models.backbones.van import VAN
    from rs_detection_tpu.models.necks.fpn import FPN
    from rs_detection_tpu.models.roi_heads.oriented_head import \
        OrientedHead
    from rs_detection_tpu.models.roi_heads.oriented_rpn_head import \
        OrientedRPNHead
    from rs_detection_tpu.utils.checkpoint_convert import \
        torch_state_to_flax

    rng = np.random.RandomState(42)
    x = rng.rand(1, 512, 512, 3).astype(np.float32)

    # ---- torch chain at real dims
    t_bb = TVANFull().eval()
    _nontrivial_init(t_bb, rng)
    with torch.no_grad():
        outs_t = t_bb(torch.tensor(x.transpose(0, 3, 1, 2)))

    # ---- flax backbone with converted weights
    j_bb = VAN(embed_dims=EMBED, mlp_ratios=RATIOS, depths=DEPTHS,
               remat=False)
    params, batch_stats = _convert(t_bb)
    outs_j = j_bb.apply({"params": params, "batch_stats": batch_stats},
                        x)

    for i in range(4):
        a = np.asarray(outs_j[i])
        b = outs_t[i].numpy()
        assert np.isfinite(a).all() and np.isfinite(b).all(), i
        # the signal must not have decayed to nothing (the compare
        # would be vacuous)
        assert np.abs(b).max() > 1e-6, _stat(f"stage{i+1}", b)
        np.testing.assert_allclose(
            a, b, rtol=5e-3, atol=2e-4,
            err_msg=f"stage{i+1}: " + _stat("t", b))

    # ---- FPN-256
    t_fpn = TFPN(ins=EMBED, out=256).eval()
    _nontrivial_init(t_fpn, rng)
    p_fpn, _ = _convert(t_fpn)
    j_fpn = FPN(in_channels=EMBED, out_channels=256, num_outs=5)
    fpn_j = j_fpn.apply({"params": p_fpn}, list(outs_j))
    with torch.no_grad():
        fpn_t = t_fpn([o.permute(0, 3, 1, 2) for o in outs_t])
    for i in range(5):
        np.testing.assert_allclose(
            np.asarray(fpn_j[i]),
            fpn_t[i].numpy().transpose(0, 2, 3, 1),
            rtol=5e-3, atol=2e-4, err_msg=f"fpn p{i}")

    # ---- 7-anchor RPN logits at C=256
    import jax.numpy as jnp

    j_rpn = OrientedRPNHead(
        in_channels=256, feat_channels=256,
        anchor_generator=dict(
            scales=[8],
            ratios=[0.125, 0.25, 0.5, 1.0, 2.0, 4.0, 8.0],
            strides=[4, 8, 16, 32, 64]),
        nms_pre=2000, nms_post=2000, pre_nms_cap=4096)
    v_rpn = jax.eval_shape(
        lambda: j_rpn.init(jax.random.PRNGKey(0),
                           [jnp.zeros_like(f) for f in fpn_j]))
    a = v_rpn["params"]["rpn_cls"]["kernel"].shape[-1]
    assert a == 7, a
    t_rpn = TOrientedRPN(c=256, a=7).eval()
    _nontrivial_init(t_rpn, rng)
    p_rpn, _ = torch_state_to_flax(t_rpn.state_dict())
    cls_j, reg_j = j_rpn.apply({"params": p_rpn}, list(fpn_j))
    with torch.no_grad():
        rpn_t = t_rpn([torch.tensor(
            np.asarray(f).transpose(0, 3, 1, 2)) for f in fpn_j])
    for lv in range(5):
        np.testing.assert_allclose(
            np.asarray(cls_j[lv]).reshape(-1),
            rpn_t[lv][0].numpy().transpose(0, 2, 3, 1).reshape(-1),
            rtol=5e-3, atol=2e-4, err_msg=f"rpn cls l{lv}")
        np.testing.assert_allclose(
            np.asarray(reg_j[lv]).reshape(-1),
            rpn_t[lv][1].numpy().transpose(0, 2, 3, 1).reshape(-1),
            rtol=5e-3, atol=2e-4, err_msg=f"rpn reg l{lv}")

    # ---- rotated RoIAlign at C=256 + the 1024-fc head stack
    rois = np.array([
        [0, 120, 130, 90, 40, 0.4], [0, 300, 250, 200, 90, -0.8],
        [0, 64, 400, 28, 12, 1.2], [0, 256, 256, 420, 180, 0.0],
        [0, 450, 60, 60, 26, -0.3], [0, 40, 40, 16, 8, 0.7],
    ], np.float32)
    t_fc = TRoIHeadFull().eval()
    _nontrivial_init(t_fc, rng)
    with torch.no_grad():
        pooled_t = _t_rroi_align_pyramid(
            [torch.tensor(np.asarray(f).transpose(0, 3, 1, 2))
             for f in fpn_j], rois)
        cls_t, reg_t = t_fc(pooled_t)

    j_head = OrientedHead(
        num_classes=10, in_channels=256,
        bbox_roi_extractor=dict(
            roi_layer=dict(output_size=7, sampling_ratio=2),
            out_channels=256, extend_factor=(1.4, 1.2),
            featmap_strides=[4, 8, 16, 32]))
    p_fc, _ = torch_state_to_flax(
        t_fc.state_dict(), fc_spatial={"shared_fc0": (256, 7, 7)})
    cls_jh, reg_jh = j_head.apply(
        {"params": p_fc}, list(fpn_j), jnp.asarray(rois),
        method=j_head.forward_rois)
    np.testing.assert_allclose(np.asarray(cls_jh), cls_t.numpy(),
                               rtol=5e-3, atol=5e-4)
    np.testing.assert_allclose(np.asarray(reg_jh), reg_t.numpy(),
                               rtol=5e-3, atol=5e-4)
