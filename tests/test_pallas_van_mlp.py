"""Fused VAN MLP kernel vs the XLA composition (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np

from rs_detection_tpu.ops.pallas_van_mlp import _ref_mlp, van_mlp


def _params(rng, c, ch):
    return (jnp.asarray(rng.randn(c, ch), jnp.float32) * 0.1,
            jnp.asarray(rng.randn(ch), jnp.float32) * 0.1,
            jnp.asarray(rng.randn(9, ch), jnp.float32) * 0.1,
            jnp.asarray(rng.randn(ch), jnp.float32) * 0.1,
            jnp.asarray(rng.randn(ch, c), jnp.float32) * 0.1,
            jnp.asarray(rng.randn(c), jnp.float32) * 0.1)


def test_matches_ref():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 16, 24, 8), jnp.float32)
    p = _params(rng, 8, 32)
    got = van_mlp(x, *p)
    ref = _ref_mlp(x, *p)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_non_multiple_height():
    rng = np.random.RandomState(1)
    # H=13 not a multiple of the block height; W=20 needs padding
    x = jnp.asarray(rng.randn(1, 13, 20, 16), jnp.float32)
    p = _params(rng, 16, 64)
    got = van_mlp(x, *p)
    ref = _ref_mlp(x, *p)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_border_zero_padding_semantics():
    """SAME padding of the dw conv applies to the HIDDEN tensor (fc1
    of zero-padding would be the bias — must not leak in)."""
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(1, 8, 8, 4), jnp.float32)
    p = list(_params(rng, 4, 16))
    p[1] = p[1] + 10.0   # big fc1 bias amplifies any padding leak
    got = van_mlp(x, *p)
    ref = _ref_mlp(x, *p)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=3e-3)


def test_grad_matches_ref():
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(1, 8, 8, 4), jnp.float32)
    p = _params(rng, 4, 16)
    g1 = jax.grad(lambda v: van_mlp(v, *p).sum())(x)
    g2 = jax.grad(lambda v: _ref_mlp(v, *p).sum())(x)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=1e-4, atol=1e-4)


def test_bf16():
    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.randn(1, 16, 16, 8), jnp.bfloat16)
    p = [q.astype(jnp.bfloat16) for q in _params(rng, 8, 32)]
    got = np.asarray(van_mlp(x, *p), np.float32)
    ref = np.asarray(_ref_mlp(x, *p), np.float32)
    np.testing.assert_allclose(got, ref, rtol=0.05, atol=0.05)


def test_kernel_int8_serving_mode(monkeypatch):
    """RS_INT8=1 runs fc1/fc2 as in-kernel s8xs8->s32 MXU dots with
    per-row-block activation scales; output must track the f32
    reference within int8 error bounds."""
    import jax.numpy as jnp

    from rs_detection_tpu.ops.pallas_van_mlp import _ref_mlp, van_mlp

    rng = np.random.RandomState(21)
    n, h, w, c, ch = 1, 24, 40, 32, 128
    x = jnp.asarray(rng.randn(n, h, w, c).astype(np.float32))
    w1 = jnp.asarray((rng.randn(c, ch) * 0.08).astype(np.float32))
    b1 = jnp.asarray(rng.randn(ch).astype(np.float32) * 0.05)
    wdw = jnp.asarray((rng.randn(9, ch) * 0.2).astype(np.float32))
    bdw = jnp.asarray(rng.randn(ch).astype(np.float32) * 0.05)
    w2 = jnp.asarray((rng.randn(ch, c) * 0.08).astype(np.float32))
    b2 = jnp.asarray(rng.randn(c).astype(np.float32) * 0.05)

    ref = np.asarray(_ref_mlp(x, w1, b1, wdw, bdw, w2, b2))
    monkeypatch.setenv("RS_INT8", "1")
    got = np.asarray(van_mlp(x, w1, b1, wdw, bdw, w2, b2))
    monkeypatch.delenv("RS_INT8")

    rel = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-9)
    assert rel < 0.05, rel
    corr = np.corrcoef(ref.ravel(), got.ravel())[0, 1]
    assert corr > 0.998, corr
