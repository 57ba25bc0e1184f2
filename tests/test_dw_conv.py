"""dw_conv custom backward == XLA grouped-conv autodiff (exact taps).

The tap-loop weight grad and flipped-kernel input grad must match
XLA's own adjoints; shapes cover the three VAN depthwise forms
(dw3 d1, dw5 d1, dw7 d3 — reference van.py:179-213).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rs_detection_tpu.ops.dw_conv import _fwd_conv, dw_conv


@pytest.mark.parametrize("k,d", [(3, 1), (5, 1), (7, 3)])
def test_dw_conv_grads_match_xla(k, d):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 24, 20, 8).astype(np.float32))
    w = jnp.asarray(rng.randn(k, k, 1, 8).astype(np.float32) * 0.1)
    g = jnp.asarray(rng.randn(2, 24, 20, 8).astype(np.float32))

    y, vjp = jax.vjp(lambda x_, w_: dw_conv(x_, w_, d), x, w)
    y_ref, vjp_ref = jax.vjp(lambda x_, w_: _fwd_conv(x_, w_, d), x, w)
    np.testing.assert_allclose(y, y_ref, rtol=0, atol=0)

    dx, dw = vjp(g)
    dx_ref, dw_ref = vjp_ref(g)
    np.testing.assert_allclose(np.asarray(dx), np.asarray(dx_ref),
                               rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(np.asarray(dw), np.asarray(dw_ref),
                               rtol=1e-5, atol=1e-3)


def test_flag_routes_ref_mlp(monkeypatch):
    monkeypatch.setenv("RS_DW_TAP_BWD", "1")
    from rs_detection_tpu.ops.pallas_van_mlp import _ref_mlp

    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(1, 8, 8, 4).astype(np.float32))
    w1 = jnp.asarray(rng.randn(4, 8).astype(np.float32) * 0.1)
    b1 = jnp.zeros((8,), jnp.float32)
    wdw = jnp.asarray(rng.randn(9, 8).astype(np.float32) * 0.1)
    bdw = jnp.zeros((8,), jnp.float32)
    w2 = jnp.asarray(rng.randn(8, 4).astype(np.float32) * 0.1)
    b2 = jnp.zeros((4,), jnp.float32)

    def loss(w):
        return jnp.sum(_ref_mlp(x, w1, b1, w, bdw, w2, b2) ** 2)

    g_tap = jax.grad(loss)(wdw)
    monkeypatch.setenv("RS_DW_TAP_BWD", "0")
    g_xla = jax.grad(loss)(wdw)
    np.testing.assert_allclose(np.asarray(g_tap), np.asarray(g_xla),
                               rtol=1e-5, atol=1e-4)
