"""int8 serving mode (RS_INT8=1, ops/quant.py — VERDICT round-2 #2).

Scope: dense channel-mixing GEMMs/convs (VAN attention projections,
MLP fc1/fc2 on the XLA path, stage-2+ patch embeds, FPN, RPN tower
conv) run s8xs8->s32 with dynamic per-tensor activation scales and
per-output-channel weight scales; depthwise convs, box decode, NMS
and all training stay bf16/f32.

Validation tiers: op-level error bounds, whole-backbone activation
diff, and (slow) the overfit-mAP harness — train fp, serve int8, AP
must hold.
"""

import math
import os

import numpy as np
import pytest


def _seed_env(monkeypatch, on: bool):
    if on:
        monkeypatch.setenv("RS_INT8", "1")
    else:
        monkeypatch.delenv("RS_INT8", raising=False)


def test_int8_channel_matmul_error_bound():
    import jax.numpy as jnp

    from rs_detection_tpu.ops.quant import int8_channel_matmul

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(4, 33, 33, 96).astype(np.float32))
    w = jnp.asarray((rng.randn(96, 128) * 0.05).astype(np.float32))
    b = jnp.asarray(rng.randn(128).astype(np.float32))
    ref = jnp.einsum("nhwc,cd->nhwd", x, w) + b
    got = int8_channel_matmul(x, w, b)
    denom = float(jnp.max(jnp.abs(ref)))
    rel = float(jnp.max(jnp.abs(got - ref))) / denom
    # two int8 quantizations (act + weight): ~1% of dynamic range
    assert rel < 0.03, rel


def test_int8_conv_error_bound_and_zero_input():
    import jax.numpy as jnp

    from rs_detection_tpu.ops.quant import int8_conv

    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 16, 16, 64).astype(np.float32))
    w = jnp.asarray((rng.randn(3, 3, 64, 32) * 0.06).astype(np.float32))
    b = jnp.asarray(rng.randn(32).astype(np.float32))
    import jax

    ref = jax.lax.conv_general_dilated(
        x, w, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + b
    got = int8_conv(x, w, b, padding=[(1, 1), (1, 1)])
    rel = float(jnp.max(jnp.abs(got - ref)) / jnp.max(jnp.abs(ref)))
    assert rel < 0.03, rel
    # all-zero input must be exact (scale guard), not NaN
    z = int8_conv(jnp.zeros_like(x), w, b, padding=[(1, 1), (1, 1)])
    assert np.allclose(np.asarray(z), np.asarray(b), atol=1e-6)


def test_maybe_int8_conv_param_tree_matches_nn_conv(monkeypatch):
    """Drop-in contract: identical variable tree and (flag off)
    identical outputs to nn.Conv."""
    import jax
    import jax.numpy as jnp
    from flax import linen as nn

    from rs_detection_tpu.ops.quant import MaybeInt8Conv

    _seed_env(monkeypatch, False)
    x = jnp.asarray(np.random.RandomState(2)
                    .randn(1, 8, 8, 16).astype(np.float32))
    init = nn.initializers.normal(0.02)
    a = nn.Conv(8, (3, 3), padding=1, kernel_init=init)
    b = MaybeInt8Conv(8, (3, 3), padding=1, kernel_init=init)
    va = a.init(jax.random.PRNGKey(0), x)
    vb = b.init(jax.random.PRNGKey(0), x)
    ta = jax.tree_util.tree_map(lambda v: (v.shape, v.dtype), va)
    tb = jax.tree_util.tree_map(lambda v: (v.shape, v.dtype), vb)
    assert ta == tb
    ya = a.apply(va, x)
    yb = b.apply(va, x)  # same params through the drop-in
    assert np.allclose(np.asarray(ya), np.asarray(yb), atol=1e-5)


def _tiny_van():
    from rs_detection_tpu.models.backbones.van import VAN

    return VAN(embed_dims=(16, 32, 64, 128), mlp_ratios=(4, 4, 2, 2),
               depths=(1, 1, 1, 1), remat=False)


def test_van_backbone_int8_activation_diff(monkeypatch):
    """Whole-backbone activation bound: int8 serving features must
    track the fp features closely at every pyramid level."""
    import jax
    import jax.numpy as jnp

    model = _tiny_van()
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(1, 64, 64, 3).astype(np.float32))
    _seed_env(monkeypatch, False)
    v = model.init(jax.random.PRNGKey(0), x)
    ref = model.apply(v, x)
    _seed_env(monkeypatch, True)
    got = model.apply(v, x)
    _seed_env(monkeypatch, False)
    for r, g in zip(ref, got):
        r, g = np.asarray(r, np.float32), np.asarray(g, np.float32)
        rel = np.abs(g - r).max() / (np.abs(r).max() + 1e-9)
        # post-LN features: stacked per-layer int8 error stays small
        assert rel < 0.15, rel
        corr = np.corrcoef(r.ravel(), g.ravel())[0, 1]
        assert corr > 0.995, corr


@pytest.mark.slow
def test_overfit_map_holds_under_int8_serving(tmp_path, monkeypatch):
    """Train the tiny flagship in fp (Runner), then serve int8: AP per
    class must stay within 0.05 of the fp AP — the mAP-proxy delta
    the serving flag is allowed to cost (VERDICT #2 done-criterion)."""
    import rs_detection_tpu.data  # noqa: F401
    import rs_detection_tpu.models  # noqa: F401
    from rs_detection_tpu.config import get_cfg
    from rs_detection_tpu.runner.runner import Runner
    from test_map_pipeline import render_dataset
    from test_runner import _tiny_cfg

    _seed_env(monkeypatch, False)
    monkeypatch.chdir(tmp_path)
    ds_dir = render_dataset(str(tmp_path / "ds"))
    cfg = get_cfg()
    cfg.clear()
    c = _tiny_cfg(ds_dir, str(tmp_path / "w"), max_iter=None)
    c["max_epoch"] = 200
    c["optimizer"]["lr"] = 0.001
    c["scheduler"] = dict(type="StepLR", warmup="linear",
                          warmup_iters=10, warmup_ratio=0.1,
                          milestones=[150])
    c["dataset"]["val"] = dict(c["dataset"]["train"])
    c["eval_interval"] = 9999
    c["checkpoint_interval"] = 9999
    c["log_interval"] = 10000
    cfg.update(c)

    runner = Runner()
    for _ in range(200):
        runner.train()
    aps_fp = runner.val()

    _seed_env(monkeypatch, True)
    runner._eval_step = None  # retrace with the int8 serving graph
    aps_q = runner.val()
    _seed_env(monkeypatch, False)

    keys = [k for k in aps_fp
            if k.startswith("eval/1_") or k.startswith("eval/2_")]
    assert keys
    for k in keys:
        assert aps_fp[k] >= 0.3, (k, aps_fp)
        assert aps_q.get(k, 0.0) >= aps_fp[k] - 0.05, (
            k, aps_fp[k], aps_q.get(k))
