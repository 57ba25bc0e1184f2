"""Gliding Vertex + RoI-Transformer head-path torch parity.

Round-4 extension of ``test_torch_parity.py``: the two hbb-RPN RCNN
families (reference ``gliding_head.py:10-456`` /
``roi_transformer.py:76-275``) were the ones the round-3 regression
broke, so their forward chains get the same converter-level numeric
evidence the flagship OrientedRCNN chain has — backbone→FPN
activations feed a torch mirror of each head (independent scalar
RoIAlign formulations) and the flax modules through
``torch_state_to_flax``; outputs must match at f32.

Covers, per family:
 - hbb RPN logits (``RPNHead`` vs a torch conv mirror);
 - horizontal pyramid RoIAlign (``ops/roi_align.py:118`` — reference
   CUDA semantics ``roi_align.py:95-140``) via a scalar torch oracle;
 - Gliding FC stack (2 shared fcs → cls / 4-delta reg / sigmoid fix /
   sigmoid ratio, reference ``gliding_head.py``);
 - both RoI-Transformer cascade stages (hbb align → stage-1 rbox
   deltas; rotated align on rbox rois → stage-2, reference
   ``convfc_rbbox_head.py``).
"""

import math

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

from test_torch_parity import (TFPN, TOrientedRPN,  # noqa: E402
                               TResNet18, _convert, _nontrivial_init,
                               _t_bilinear, _t_rroi_align_pyramid)

pytestmark = pytest.mark.slow

OUT_C = 32
HIDDEN = 64
NUM_CLASSES = 3


def _t_hroi_align_pyramid(feats_t, rois, strides=(4, 8, 16, 32),
                          p=7, s=2, finest=56.0):
    """Scalar mirror of the horizontal pyramid RoIAlign: level by
    floor(log2(sqrt(wh)/finest + 1e-6)), torchvision-style start
    corner + bin-center grid, bilinear with the reference CUDA border
    semantics (``_t_bilinear``)."""
    r_n = rois.shape[0]
    c = feats_t[0].shape[1]
    out = torch.zeros(r_n, c, p, p)
    for r in range(r_n):
        b, x1, y1, x2, y2 = [float(v) for v in rois[r]]
        w0, h0 = x2 - x1, y2 - y1
        lvl = int(np.clip(math.floor(
            math.log2(math.sqrt(max(w0 * h0, 1e-6)) / finest + 1e-6)),
            0, len(strides) - 1))
        f = feats_t[lvl][int(b)]
        inv = 1.0 / strides[lvl]
        sx1, sy1 = x1 * inv, y1 * inv
        rw = max(x2 * inv - sx1, 1.0)
        rh = max(y2 * inv - sy1, 1.0)
        for by in range(p):
            for bx in range(p):
                acc = torch.zeros(c)
                for jy in range(s):
                    for jx in range(s):
                        x = sx1 + (bx + (jx + 0.5) / s) / p * rw
                        y = sy1 + (by + (jy + 0.5) / s) / p * rh
                        acc += _t_bilinear(f, y, x)
                out[r, :, by, bx] = acc / (s * s)
    return out


class TGlidingFC(tnn.Module):
    """Reference GlidingHead fc stack (gliding_head.py): flatten NCHW
    RoI features -> 2 shared fcs -> cls / reg(4) / sigmoid fix(4) /
    sigmoid ratio(1)."""

    def __init__(self, c=OUT_C, p=7, hidden=HIDDEN,
                 num_classes=NUM_CLASSES):
        super().__init__()
        self.shared_fc0 = tnn.Linear(c * p * p, hidden)
        self.shared_fc1 = tnn.Linear(hidden, hidden)
        self.fc_cls = tnn.Linear(hidden, num_classes + 1)
        self.fc_reg = tnn.Linear(hidden, 4)
        self.fc_fix = tnn.Linear(hidden, 4)
        self.fc_ratio = tnn.Linear(hidden, 1)

    def forward(self, pooled_nchw):
        x = pooled_nchw.flatten(1)
        x = tnn.functional.relu(self.shared_fc0(x))
        x = tnn.functional.relu(self.shared_fc1(x))
        return (self.fc_cls(x), self.fc_reg(x),
                torch.sigmoid(self.fc_fix(x)),
                torch.sigmoid(self.fc_ratio(x)))


class TRbFC(tnn.Module):
    """One RoI-Transformer cascade stage (convfc_rbbox_head.py): 2
    shared fcs -> cls / 5-dim rbox deltas."""

    def __init__(self, c=OUT_C, p=7, hidden=1024,
                 num_classes=NUM_CLASSES):
        # hidden=1024: RoITransformerHead's _FCHead fc_out is fixed at
        # the reference's 1024 (convfc_rbbox_head.py fc_out_channels)
        super().__init__()
        self.fc0 = tnn.Linear(c * p * p, hidden)
        self.fc1 = tnn.Linear(hidden, hidden)
        self.fc_cls = tnn.Linear(hidden, num_classes + 1)
        self.fc_reg = tnn.Linear(hidden, 5)

    def forward(self, pooled_nchw):
        x = pooled_nchw.flatten(1)
        x = tnn.functional.relu(self.fc0(x))
        x = tnn.functional.relu(self.fc1(x))
        return self.fc_cls(x), self.fc_reg(x)


class TRoiTrans(tnn.Module):
    def __init__(self):
        super().__init__()
        self.stage1 = TRbFC()
        self.stage2 = TRbFC()


def _fpn_feats(rng):
    """Shared front: torch backbone+FPN -> converted flax modules ->
    per-level activations used by BOTH frameworks downstream (the
    backbone/FPN parity itself is asserted in test_torch_parity)."""
    import jax  # noqa: F401

    from rs_detection_tpu.models.backbones.resnet import ResNet
    from rs_detection_tpu.models.necks.fpn import FPN

    x = rng.rand(2, 64, 64, 3).astype(np.float32)
    t_bb = TResNet18().eval()
    t_fpn = TFPN(ins=(64, 128, 256, 512), out=OUT_C).eval()
    for m in (t_bb, t_fpn):
        _nontrivial_init(m, rng)
    j_bb = ResNet(depth=18, norm_eval=True)
    p_bb, bs_bb = _convert(t_bb)
    feats_j = j_bb.apply({"params": p_bb, "batch_stats": bs_bb}, x)
    j_fpn = FPN(in_channels=(64, 128, 256, 512), out_channels=OUT_C,
                num_outs=5)
    p_fpn, _ = _convert(t_fpn)
    fpn_j = j_fpn.apply({"params": p_fpn}, feats_j)
    fpn_t = [torch.tensor(np.asarray(f).transpose(0, 3, 1, 2))
             for f in fpn_j]
    return list(fpn_j), fpn_t


HROIS = np.array([
    # (batch_idx, x1, y1, x2, y2) — spread over pyramid levels
    [0, 4.0, 6.0, 30.0, 22.0],
    [0, 10.0, 2.0, 58.0, 60.0],
    [1, 0.0, 0.0, 130.0, 130.0],     # sqrt(wh)=130 -> level 1
    [1, 20.0, 24.0, 33.0, 31.0],
    [0, 0.0, 0.0, 300.0, 260.0],     # level 2, partly out of bounds
    [1, 40.0, 40.0, 62.0, 58.0],
], np.float32)

RROIS = np.array([
    [0, 30, 30, 24, 12, 0.3], [0, 50, 40, 40, 20, -0.7],
    [1, 20, 45, 16, 8, 1.1], [1, 40, 20, 120, 60, 0.0],
    [0, 32, 32, 300, 200, -0.2], [1, 10, 10, 8, 6, 0.5],
], np.float32)


def test_full_gliding_forward_parity():
    import jax
    import jax.numpy as jnp

    from rs_detection_tpu.models.roi_heads.gliding_head import \
        GlidingHead
    from rs_detection_tpu.models.roi_heads.rpn_head import RPNHead
    from rs_detection_tpu.utils.checkpoint_convert import \
        torch_state_to_flax

    rng = np.random.RandomState(11)
    fpn_j, fpn_t = _fpn_feats(rng)

    # ---- hbb RPN logits
    j_rpn = RPNHead(in_channels=OUT_C, feat_channels=OUT_C)
    v_rpn = j_rpn.init(jax.random.PRNGKey(0), list(fpn_j))
    a = v_rpn["params"]["rpn_cls"]["kernel"].shape[-1]
    del v_rpn
    t_rpn = TOrientedRPN(c=OUT_C, a=a, reg_dim=4).eval()
    _nontrivial_init(t_rpn, rng)
    p_rpn, _ = torch_state_to_flax(t_rpn.state_dict())
    cls_j, reg_j = j_rpn.apply({"params": p_rpn}, list(fpn_j))
    with torch.no_grad():
        rpn_t = t_rpn(fpn_t)
    for lv in range(5):
        np.testing.assert_allclose(
            np.asarray(cls_j[lv]),
            rpn_t[lv][0].numpy().transpose(0, 2, 3, 1),
            rtol=1e-3, atol=1e-4)
        n = rpn_t[lv][1].shape[0]
        np.testing.assert_allclose(
            np.asarray(reg_j[lv]).reshape(n, -1),
            rpn_t[lv][1].numpy().transpose(0, 2, 3, 1).reshape(n, -1),
            rtol=1e-3, atol=1e-4)

    # ---- horizontal RoIAlign + gliding FC stack on fixed rois
    t_fc = TGlidingFC().eval()
    _nontrivial_init(t_fc, rng)
    with torch.no_grad():
        pooled_t = _t_hroi_align_pyramid([f.float() for f in fpn_t],
                                         HROIS)
        outs_t = t_fc(pooled_t)

    j_head = GlidingHead(
        num_classes=NUM_CLASSES, in_channels=OUT_C,
        fc_out_channels=HIDDEN, num_shared_fcs=2,
        bbox_roi_extractor=dict(
            roi_layer=dict(output_size=7, sampling_ratio=2),
            out_channels=OUT_C, featmap_strides=[4, 8, 16, 32]))
    p_fc, _ = torch_state_to_flax(
        t_fc.state_dict(), fc_spatial={"shared_fc0": (OUT_C, 7, 7)})
    outs_j = j_head.apply({"params": p_fc}, list(fpn_j),
                          jnp.asarray(HROIS),
                          method=j_head.forward_rois)
    for got, want in zip(outs_j, outs_t):
        np.testing.assert_allclose(np.asarray(got), want.numpy(),
                                   rtol=1e-3, atol=1e-4)


def test_full_roi_transformer_stage_parity():
    import jax.numpy as jnp

    from rs_detection_tpu.models.roi_heads.rbbox_head import \
        RoITransformerHead
    from rs_detection_tpu.utils.checkpoint_convert import \
        torch_state_to_flax

    rng = np.random.RandomState(13)
    fpn_j, fpn_t = _fpn_feats(rng)

    t_head = TRoiTrans().eval()
    _nontrivial_init(t_head, rng)
    with torch.no_grad():
        pooled_h = _t_hroi_align_pyramid([f.float() for f in fpn_t],
                                         HROIS)
        cls1_t, reg1_t = t_head.stage1(pooled_h)
        pooled_r = _t_rroi_align_pyramid([f.float() for f in fpn_t],
                                         RROIS, extend=(1.0, 1.0))
        cls2_t, reg2_t = t_head.stage2(pooled_r)

    j_head = RoITransformerHead(num_classes=NUM_CLASSES,
                                in_channels=OUT_C,
                                featmap_strides=(4, 8, 16, 32))
    params, _ = torch_state_to_flax(
        t_head.state_dict(),
        fc_spatial={"stage1.fc0": (OUT_C, 7, 7),
                    "stage2.fc0": (OUT_C, 7, 7)})

    def fwd(mdl, feats, hrois, rrois):
        x = mdl._h_extractor(feats, hrois)
        c1, r1 = mdl.stage1(x.reshape(x.shape[0], -1))
        xr = mdl._r_extractor(feats, rrois)
        c2, r2 = mdl.stage2(xr.reshape(xr.shape[0], -1))
        return c1, r1, c2, r2

    cls1_j, reg1_j, cls2_j, reg2_j = j_head.apply(
        {"params": params}, list(fpn_j), jnp.asarray(HROIS),
        jnp.asarray(RROIS), method=fwd)
    for got, want in ((cls1_j, cls1_t), (reg1_j, reg1_t),
                      (cls2_j, cls2_t), (reg2_j, reg2_t)):
        np.testing.assert_allclose(np.asarray(got), want.numpy(),
                                   rtol=1e-3, atol=1e-4)
