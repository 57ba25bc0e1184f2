"""Cross-framework parity: torch reimplementations of the reference
backbone math vs the flax/JAX modules, through the checkpoint
converter.

This is the activation-level parity evidence the reference gathers
with ``utils/check_diff.py`` (torch-vs-jittor pickles): we build the
same architecture in torch (the reference's semantics — erf GELU,
BN running stats, SAME-as-torch conv padding), convert its randomly
initialized ``state_dict`` through ``torch_state_to_flax``, run both
frameworks on the same input, and require stage outputs to match.
Passing proves (a) the converter's layout mapping and (b) the JAX
modules' math are both faithful — the exact chain a converted
reference checkpoint takes.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402



pytestmark = pytest.mark.slow

class TNorm(tnn.Module):
    """BN wrapped one level deep to mirror flax's Norm/BatchNorm_0."""

    def __init__(self, c):
        super().__init__()
        self.BatchNorm_0 = tnn.BatchNorm2d(c)

    def forward(self, x):
        return self.BatchNorm_0(x)


def _randomize_bn_stats(module, rng):
    """Give running stats non-trivial values so the eval-mode compare
    actually exercises them."""
    for m in module.modules():
        if isinstance(m, tnn.BatchNorm2d):
            m.running_mean.copy_(torch.tensor(
                rng.randn(m.num_features).astype(np.float32)) * 0.1)
            m.running_var.copy_(torch.tensor(
                1.0 + 0.5 * rng.rand(m.num_features).astype(np.float32)))


def _convert(tmodel):
    from rs_detection_tpu.utils.checkpoint_convert import \
        torch_state_to_flax

    return torch_state_to_flax(
        {k: v for k, v in tmodel.state_dict().items()})


def _assert_tree_shapes_match(converted, initialized, path=""):
    """Converted params must line up name-for-name with the flax init
    tree (catches naming drift before it becomes a silent zero-init)."""
    assert set(converted) == set(initialized), (
        f"{path}: {sorted(converted)} vs {sorted(initialized)}")
    for k in converted:
        a, b = converted[k], initialized[k]
        if isinstance(a, dict):
            _assert_tree_shapes_match(a, b, f"{path}/{k}")
        else:
            assert np.asarray(a).shape == np.asarray(b).shape, \
                f"{path}/{k}: {np.asarray(a).shape} vs {np.asarray(b).shape}"


class TBasicBlock(tnn.Module):
    def __init__(self, cin, planes, stride=1, downsample=False):
        super().__init__()
        self.Conv_0 = tnn.Conv2d(cin, planes, 3, stride, 1, bias=False)
        self.Norm_0 = TNorm(planes)
        self.Conv_1 = tnn.Conv2d(planes, planes, 3, 1, 1, bias=False)
        self.Norm_1 = TNorm(planes)
        self.has_ds = downsample
        if downsample:
            self.Conv_2 = tnn.Conv2d(cin, planes, 1, stride, bias=False)
            self.Norm_2 = TNorm(planes)

    def forward(self, x):
        idt = x
        out = torch.relu(self.Norm_0(self.Conv_0(x)))
        out = self.Norm_1(self.Conv_1(out))
        if self.has_ds:
            idt = self.Norm_2(self.Conv_2(x))
        return torch.relu(out + idt)


class TResNet18(tnn.Module):
    def __init__(self):
        super().__init__()
        self.Conv_0 = tnn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.Norm_0 = TNorm(64)
        self.pool = tnn.MaxPool2d(3, 2, 1)
        cin, planes = 64, 64
        for stage in range(4):
            stride = 1 if stage == 0 else 2
            for b in range(2):
                s = stride if b == 0 else 1
                ds = b == 0 and (s != 1 or cin != planes)
                setattr(self, f"layer{stage+1}_{b}",
                        TBasicBlock(cin, planes, s, ds))
                cin = planes
            planes *= 2

    def forward(self, x):
        x = self.pool(torch.relu(self.Norm_0(self.Conv_0(x))))
        outs = []
        for stage in range(4):
            for b in range(2):
                x = getattr(self, f"layer{stage+1}_{b}")(x)
            outs.append(x)
        return outs


class TLKA(tnn.Module):
    def __init__(self, dim):
        super().__init__()
        self.conv0 = tnn.Conv2d(dim, dim, 5, padding=2, groups=dim)
        self.conv_spatial = tnn.Conv2d(dim, dim, 7, padding=9,
                                       dilation=3, groups=dim)
        self.conv1 = tnn.Conv2d(dim, dim, 1)

    def forward(self, x):
        return x * self.conv1(self.conv_spatial(self.conv0(x)))


class TSpatialAttn(tnn.Module):
    def __init__(self, dim):
        super().__init__()
        self.proj_1 = tnn.Conv2d(dim, dim, 1)
        self.gelu = tnn.GELU()
        self.sgu = TLKA(dim)
        self.proj_2 = tnn.Conv2d(dim, dim, 1)

    def forward(self, x):
        shortcut = x
        x = self.sgu(self.gelu(self.proj_1(x)))
        return self.proj_2(x) + shortcut


class TMlp(tnn.Module):
    def __init__(self, dim, hidden):
        super().__init__()
        self.fc1 = tnn.Conv2d(dim, hidden, 1)
        self.dwconv = tnn.Conv2d(hidden, hidden, 3, padding=1,
                                 groups=hidden)
        self.gelu = tnn.GELU()
        self.fc2 = tnn.Conv2d(hidden, dim, 1)

    def forward(self, x):
        return self.fc2(self.gelu(self.dwconv(self.fc1(x))))


class TVANBlock(tnn.Module):
    def __init__(self, dim, mlp_ratio):
        super().__init__()
        self.norm1 = TNorm(dim)
        self.attn = TSpatialAttn(dim)
        self.norm2 = TNorm(dim)
        self.mlp = TMlp(dim, int(dim * mlp_ratio))
        self.layer_scale_1 = tnn.Parameter(torch.ones(dim) * 1e-2)
        self.layer_scale_2 = tnn.Parameter(torch.ones(dim) * 1e-2)

    def forward(self, x):
        x = x + self.layer_scale_1[None, :, None, None] \
            * self.attn(self.norm1(x))
        x = x + self.layer_scale_2[None, :, None, None] \
            * self.mlp(self.norm2(x))
        return x


class TPatchEmbed(tnn.Module):
    def __init__(self, cin, dim, patch, stride):
        super().__init__()
        self.proj = tnn.Conv2d(cin, dim, patch, stride, patch // 2)
        self.norm = TNorm(dim)

    def forward(self, x):
        return self.norm(self.proj(x))


class TVANStage(tnn.Module):
    """One VAN stage (patch embed + 2 blocks + channel LayerNorm)."""

    def __init__(self, dim=16, mlp_ratio=8, depth=2):
        super().__init__()
        self.patch_embed1 = TPatchEmbed(3, dim, 7, 4)
        for j in range(depth):
            setattr(self, f"block1_{j}", TVANBlock(dim, mlp_ratio))
        self.norm1 = tnn.LayerNorm(dim, eps=1e-6)
        self.depth = depth

    def forward(self, x):
        x = self.patch_embed1(x)
        for j in range(self.depth):
            x = getattr(self, f"block1_{j}")(x)
        # channel LN on NHWC view (the reference's flatten->LN dance)
        x = x.permute(0, 2, 3, 1)
        x = self.norm1(x)
        return x  # NHWC


def _nontrivial_init(tmodel, rng):
    with torch.no_grad():
        for p in tmodel.parameters():
            p.copy_(torch.tensor(
                (rng.randn(*p.shape) * 0.05).astype(np.float32)))
        _randomize_bn_stats(tmodel, rng)


def test_resnet18_activation_parity():
    import jax

    from rs_detection_tpu.models.backbones.resnet import ResNet
    from rs_detection_tpu.utils.check_diff import compare_recordings

    rng = np.random.RandomState(0)
    tmodel = TResNet18().eval()
    _nontrivial_init(tmodel, rng)
    params, batch_stats = _convert(tmodel)

    jmodel = ResNet(depth=18, norm_eval=True)
    x = rng.rand(2, 64, 64, 3).astype(np.float32)
    init = jmodel.init(jax.random.PRNGKey(0), x)
    _assert_tree_shapes_match(params, init["params"])
    _assert_tree_shapes_match(batch_stats, init["batch_stats"])

    outs_j = jmodel.apply(
        {"params": params, "batch_stats": batch_stats}, x)
    with torch.no_grad():
        outs_t = tmodel(torch.tensor(x.transpose(0, 3, 1, 2)))

    rec_t = {f"layer{i+1}": o.numpy() for i, o in enumerate(outs_t)}
    rec_j = {f"layer{i+1}": np.asarray(o) for i, o in enumerate(outs_j)}
    report = compare_recordings(rec_t, rec_j, rtol=1e-3, atol=1e-4)
    bad = {k: v for k, v in report.items() if not v["ok"]}
    assert not bad, bad


def test_van_stage_activation_parity():
    import jax

    from rs_detection_tpu.models.backbones.van import VAN
    from rs_detection_tpu.utils.check_diff import compare_recordings

    rng = np.random.RandomState(1)
    tmodel = TVANStage(dim=16, mlp_ratio=8, depth=2).eval()
    _nontrivial_init(tmodel, rng)
    params, batch_stats = _convert(tmodel)

    jmodel = VAN(embed_dims=(16,), mlp_ratios=(8,), depths=(2,),
                 out_indices=(0,), remat=False)
    x = rng.rand(2, 32, 32, 3).astype(np.float32)
    init = jmodel.init(jax.random.PRNGKey(0), x)
    _assert_tree_shapes_match(params, init["params"])
    _assert_tree_shapes_match(batch_stats, init["batch_stats"])

    (out_j,) = jmodel.apply(
        {"params": params, "batch_stats": batch_stats}, x)
    with torch.no_grad():
        out_t = tmodel(torch.tensor(x.transpose(0, 3, 1, 2)))

    report = compare_recordings({"stage1": out_t.numpy()},
                                {"stage1": np.asarray(out_j)},
                                rtol=1e-3, atol=1e-4)
    assert report["stage1"]["ok"], report


def test_recorder_and_report_tools(tmp_path):
    """check_diff tooling: torch hooks record leaf activations; the
    comparison flags an injected mismatch and passes on identity."""
    from rs_detection_tpu.utils.check_diff import (ActivationRecorder,
                                                   check_diff,
                                                   compare_data)

    tmodel = TMlp(8, 16).eval()
    rec = ActivationRecorder()
    rec.hook_torch(tmodel)
    x = torch.randn(1, 8, 4, 4)
    with torch.no_grad():
        tmodel(x)
    rec.unhook()
    assert {"fc1", "dwconv", "gelu", "fc2"} <= set(rec.data)
    p_a = str(tmp_path / "a.pkl")
    rec.save(p_a)

    # identical copy passes
    p_b = str(tmp_path / "b.pkl")
    rec.save(p_b)
    assert check_diff(p_a, p_b)

    # perturb one layer -> flagged
    rec.data["fc2"] = rec.data["fc2"] + 1.0
    p_c = str(tmp_path / "c.pkl")
    rec.save(p_c)
    report = compare_data(p_a, p_c)
    assert not report["fc2"]["ok"] and report["fc1"]["ok"]


def test_layout_auto_alignment():
    from rs_detection_tpu.utils.check_diff import compare_recordings

    a = np.random.RandomState(2).rand(2, 5, 6, 3).astype(np.float32)
    report = compare_recordings({"x": a.transpose(0, 3, 1, 2)},
                                {"x": a})
    assert report["x"]["ok"]


class TFPN(tnn.Module):
    """Torch mirror of necks/fpn.py (lateral 1x1 + nearest upsample +
    3x3 out convs + maxpool extra level) with flax-matching names."""

    def __init__(self, ins=(32, 64, 128, 256), out=32):
        super().__init__()
        for i, c in enumerate(ins):
            setattr(self, f"lateral_{i}", tnn.Conv2d(c, out, 1))
            setattr(self, f"fpn_conv_{i}",
                    tnn.Conv2d(out, out, 3, padding=1))
        self.n = len(ins)

    def forward(self, feats):
        lats = [getattr(self, f"lateral_{i}")(f)
                for i, f in enumerate(feats)]
        for i in range(self.n - 1, 0, -1):
            lats[i - 1] = lats[i - 1] + tnn.functional.interpolate(
                lats[i], size=lats[i - 1].shape[-2:], mode="nearest")
        outs = [getattr(self, f"fpn_conv_{i}")(lats[i])
                for i in range(self.n)]
        outs.append(tnn.functional.max_pool2d(outs[-1], 1, stride=2))
        return outs


def test_fpn_activation_parity():
    """FPN top-down math (incl. nearest upsample + maxpool extra
    level) matches torch through the checkpoint converter."""
    import jax

    from rs_detection_tpu.models.necks.fpn import FPN
    from rs_detection_tpu.utils.check_diff import compare_recordings

    rng = np.random.RandomState(0)
    tmodel = TFPN().eval()
    _nontrivial_init(tmodel, rng)
    params, _ = _convert(tmodel)

    jmodel = FPN(in_channels=(32, 64, 128, 256), out_channels=32,
                 num_outs=5)
    feats = [rng.rand(2, 32 // (2 ** i), 32 // (2 ** i),
                      c).astype(np.float32)
             for i, c in enumerate((32, 64, 128, 256))]
    init = jmodel.init(jax.random.PRNGKey(0), feats)
    _assert_tree_shapes_match(params, init["params"])

    outs_j = jmodel.apply({"params": params}, feats)
    with torch.no_grad():
        outs_t = tmodel([torch.tensor(f.transpose(0, 3, 1, 2))
                         for f in feats])
    # transpose explicitly: p0 is [2,32,32,32], where the NCHW->NHWC
    # permutation is shape-ambiguous and auto_layout cannot detect it
    rec_t = {f"p{i}": o.numpy().transpose(0, 2, 3, 1)
             for i, o in enumerate(outs_t)}
    rec_j = {f"p{i}": np.asarray(o) for i, o in enumerate(outs_j)}
    report = compare_recordings(rec_t, rec_j, rtol=1e-3, atol=1e-4)
    bad = {k: v for k, v in report.items() if not v["ok"]}
    assert not bad, bad


# ---------------------------------------------------------------------------
# Full OrientedRCNN forward parity (VERDICT round-2 #5): backbone ->
# FPN -> RPN logits -> rotated RoIAlign -> RoI-head logits, f32,
# through the checkpoint converter. The torch side implements the
# reference math independently (ROIAlignRotated_v1 sampling,
# roi_align_rotated_v1.py:24-68,300-375; level mapping + extend_factor,
# oriented_single_level.py:53-103; fc over the NCHW flatten).
# ---------------------------------------------------------------------------

class TOrientedRPN(tnn.Module):
    def __init__(self, c=32, a=3, reg_dim=6):
        super().__init__()
        self.rpn_conv = tnn.Conv2d(c, c, 3, padding=1)
        self.rpn_cls = tnn.Conv2d(c, a, 1)
        self.rpn_reg = tnn.Conv2d(c, a * reg_dim, 1)

    def forward(self, feats):
        outs = []
        for f in feats:
            h = tnn.functional.relu(self.rpn_conv(f))
            outs.append((self.rpn_cls(h), self.rpn_reg(h)))
        return outs


class TRoIFC(tnn.Module):
    """Reference OrientedHead fc stack: flatten NCHW RoI features ->
    shared fc -> relu -> cls/reg heads."""

    def __init__(self, c=32, p=7, hidden=64, num_classes=3, reg=5):
        super().__init__()
        self.shared_fc0 = tnn.Linear(c * p * p, hidden)
        self.fc_cls = tnn.Linear(hidden, num_classes + 1)
        self.fc_reg = tnn.Linear(hidden, reg)

    def forward(self, pooled_nchw):
        x = pooled_nchw.flatten(1)          # (C, P, P) order — torch
        x = tnn.functional.relu(self.shared_fc0(x))
        return self.fc_cls(x), self.fc_reg(x)


def _t_bilinear(f, y, x):
    """f [C,H,W]; reference CUDA bilinear_interpolate semantics."""
    _, h, w = f.shape
    if y < -1.0 or y > h or x < -1.0 or x > w:
        return torch.zeros(f.shape[0])
    y = max(y, 0.0)
    x = max(x, 0.0)
    y_low, x_low = int(y), int(x)
    if y_low >= h - 1:
        y_low = y_high = h - 1
        y = float(y_low)
    else:
        y_high = y_low + 1
    if x_low >= w - 1:
        x_low = x_high = w - 1
        x = float(x_low)
    else:
        x_high = x_low + 1
    ly, lx = y - y_low, x - x_low
    hy, hx = 1.0 - ly, 1.0 - lx
    return (hy * hx * f[:, y_low, x_low] + hy * lx * f[:, y_low, x_high]
            + ly * hx * f[:, y_high, x_low]
            + ly * lx * f[:, y_high, x_high])


def _t_rroi_align_pyramid(feats_t, rois, strides=(4, 8, 16, 32),
                          p=7, s=2, finest=56.0, extend=(1.4, 1.2)):
    """Reference extractor mirror: extend_factor inflation, FPN level
    map floor(log2(sqrt(wh)/56 + 1e-6)), rotated-grid bilinear mean."""
    import math

    r_n = rois.shape[0]
    c = feats_t[0].shape[1]
    out = torch.zeros(r_n, c, p, p)
    for r in range(r_n):
        b, cx0, cy0, w0, h0, th = [float(v) for v in rois[r]]
        w0, h0 = w0 * extend[1], h0 * extend[0]
        lvl = int(np.clip(math.floor(
            math.log2(math.sqrt(max(w0 * h0, 1e-6)) / finest + 1e-6)),
            0, len(strides) - 1))
        f = feats_t[lvl][int(b)]
        inv = 1.0 / strides[lvl]
        cx, cy = cx0 * inv - 0.5, cy0 * inv - 0.5
        rw, rh = max(w0 * inv, 1.0), max(h0 * inv, 1.0)
        ct, st = math.cos(th), math.sin(th)
        for by in range(p):
            for bx in range(p):
                acc = torch.zeros(c)
                for jy in range(s):
                    for jx in range(s):
                        gx = ((bx + (jx + 0.5) / s) / p - 0.5) * rw
                        gy = ((by + (jy + 0.5) / s) / p - 0.5) * rh
                        x = gx * ct + gy * st + cx
                        y = gy * ct - gx * st + cy
                        acc += _t_bilinear(f, y, x)
                out[r, :, by, bx] = acc / (s * s)
    return out


def test_full_oriented_rcnn_forward_parity():
    """backbone -> FPN -> RPN logits -> rotated RoIAlign -> RoI-head
    logits, torch vs flax through the converter (f32) — the exact
    chain a converted reference checkpoint takes (extends the
    per-stage parity above to the flagship head path)."""
    import jax

    from rs_detection_tpu.models.backbones.resnet import ResNet
    from rs_detection_tpu.models.necks.fpn import FPN
    from rs_detection_tpu.models.roi_heads.oriented_head import \
        OrientedHead
    from rs_detection_tpu.models.roi_heads.oriented_rpn_head import \
        OrientedRPNHead
    from rs_detection_tpu.utils.checkpoint_convert import \
        torch_state_to_flax

    rng = np.random.RandomState(7)
    x = rng.rand(2, 64, 64, 3).astype(np.float32)

    # ---- torch chain
    t_bb = TResNet18().eval()
    t_fpn = TFPN(ins=(64, 128, 256, 512), out=32).eval()
    for m in (t_bb, t_fpn):
        _nontrivial_init(m, rng)
    with torch.no_grad():
        feats_t = t_bb(torch.tensor(x.transpose(0, 3, 1, 2)))
        fpn_t = t_fpn(list(feats_t))

    # ---- flax backbone+fpn with converted weights
    j_bb = ResNet(depth=18, norm_eval=True)
    p_bb, bs_bb = _convert(t_bb)
    feats_j = j_bb.apply({"params": p_bb, "batch_stats": bs_bb}, x)
    j_fpn = FPN(in_channels=(64, 128, 256, 512), out_channels=32,
                num_outs=5)
    p_fpn, _ = _convert(t_fpn)
    fpn_j = j_fpn.apply({"params": p_fpn}, feats_j)
    for i in range(5):
        np.testing.assert_allclose(
            np.asarray(fpn_j[i]),
            fpn_t[i].detach().numpy().transpose(0, 2, 3, 1),
            rtol=1e-3, atol=1e-4)

    # ---- RPN logits
    j_rpn = OrientedRPNHead(in_channels=32, feat_channels=32)
    v_rpn = j_rpn.init(jax.random.PRNGKey(0), list(fpn_j))
    a = v_rpn["params"]["rpn_cls"]["kernel"].shape[-1]
    t_rpn = TOrientedRPN(c=32, a=a).eval()
    _nontrivial_init(t_rpn, rng)
    p_rpn, _ = torch_state_to_flax(t_rpn.state_dict())
    del v_rpn
    cls_j, reg_j = j_rpn.apply({"params": p_rpn}, list(fpn_j))
    with torch.no_grad():
        rpn_t = t_rpn([torch.tensor(np.asarray(f).transpose(0, 3, 1, 2))
                       for f in fpn_j])
    for lv in range(5):
        np.testing.assert_allclose(
            np.asarray(cls_j[lv]).reshape(rpn_t[lv][0].shape[0], -1),
            rpn_t[lv][0].numpy().transpose(0, 2, 3, 1)
            .reshape(rpn_t[lv][0].shape[0], -1),
            rtol=1e-3, atol=1e-4)
        np.testing.assert_allclose(
            np.asarray(reg_j[lv]).reshape(rpn_t[lv][1].shape[0], -1),
            rpn_t[lv][1].numpy().transpose(0, 2, 3, 1)
            .reshape(rpn_t[lv][1].shape[0], -1),
            rtol=1e-3, atol=1e-4)

    # ---- rotated RoIAlign + RoI-head logits on fixed rois
    rois = np.array([
        [0, 30, 30, 24, 12, 0.3], [0, 50, 40, 40, 20, -0.7],
        [1, 20, 45, 16, 8, 1.1], [1, 40, 20, 120, 60, 0.0],
        [0, 32, 32, 300, 200, -0.2], [1, 10, 10, 8, 6, 0.5],
    ], np.float32)
    t_fc = TRoIFC(c=32, p=7, hidden=64, num_classes=3).eval()
    _nontrivial_init(t_fc, rng)
    with torch.no_grad():
        pooled_t = _t_rroi_align_pyramid(
            [f.float() for f in [torch.tensor(
                np.asarray(fj).transpose(0, 3, 1, 2)) for fj in fpn_j]],
            rois)
        cls_t, reg_t = t_fc(pooled_t)

    j_head = OrientedHead(
        num_classes=3, in_channels=32, fc_out_channels=64,
        num_shared_fcs=1,
        bbox_roi_extractor=dict(
            roi_layer=dict(output_size=7, sampling_ratio=2),
            out_channels=32, extend_factor=(1.4, 1.2),
            featmap_strides=[4, 8, 16, 32]))
    # torch flattens (C, P, P); flax flattens (P, P, C) — the
    # converter's fc_spatial permute covers exactly this
    p_fc, _ = torch_state_to_flax(t_fc.state_dict(),
                                  fc_spatial={"shared_fc0": (32, 7, 7)})
    cls_jh, reg_jh = j_head.apply(
        {"params": p_fc}, list(fpn_j), jnp_rois(rois),
        method=j_head.forward_rois)
    np.testing.assert_allclose(np.asarray(cls_jh), cls_t.numpy(),
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(reg_jh), reg_t.numpy(),
                               rtol=1e-3, atol=1e-4)


def jnp_rois(rois):
    import jax.numpy as jnp

    return jnp.asarray(rois)
