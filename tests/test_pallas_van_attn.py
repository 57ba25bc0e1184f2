"""Fused VAN attention kernel vs the XLA composition (interpret mode
on CPU; Mosaic path exercised on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def _weights(C, seed=0):
    rng = np.random.RandomState(seed)
    mk = lambda *s, scale=0.1: jnp.asarray(
        rng.randn(*s).astype(np.float32) * scale)
    return dict(
        a1=1.0 + mk(C), b1=mk(C),
        wp1=mk(C, C), bp1=mk(C),
        wdw5=mk(25, C), bdw5=mk(C),
        wdw7=mk(49, C, scale=0.05), bdw7=mk(C),
        wc1=mk(C, C), bc1=mk(C),
        wp2=mk(C, C), bp2=mk(C),
        ls1=mk(C, scale=0.01))


ORDER = ("a1", "b1", "wp1", "bp1", "wdw5", "bdw5", "wdw7", "bdw7",
         "wc1", "bc1", "wp2", "bp2", "ls1")


@pytest.mark.parametrize("shape,block_rows", [
    ((1, 16, 16, 32), 8),      # single block + channel pad
    ((2, 24, 20, 32), 8),      # multi-image, non-square, row blocks
    ((1, 13, 16, 32), 8),      # H not divisible by block
])
def test_attn_kernel_matches_xla(shape, block_rows):
    from rs_detection_tpu.ops.pallas_van_attn import _ref_attn, van_attn

    n, h, w, c = shape
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(*shape).astype(np.float32) * 0.5)
    wts = _weights(c)
    args = [wts[k] for k in ORDER]
    want = np.asarray(_ref_attn(x, *args))
    got = np.asarray(van_attn(x, *args, block_rows=block_rows))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_fused_block_equals_xla_block():
    """VANBlock fused path (attn kernel + folded-residual MLP kernel)
    == the XLA block, using real module params."""
    import os

    from rs_detection_tpu.models.backbones.van import VANBlock

    # fused path is TPU-gated inside the module; emulate by calling
    # the kernels directly through the module's param tree
    block = VANBlock(dim=32, mlp_ratio=4.0)
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(1, 16, 16, 32).astype(np.float32) * 0.5)
    variables = block.init(jax.random.PRNGKey(0), x)
    # randomize BN stats so the affine fold is non-trivial
    bs = jax.tree_util.tree_map(
        lambda a: jnp.asarray(rng.rand(*a.shape).astype(np.float32)
                              * 0.5 + 0.75),
        variables["batch_stats"])
    variables = {"params": variables["params"], "batch_stats": bs}

    want = block.apply(variables, x)            # XLA path (cpu)

    os.environ["RS_VAN_FUSED_FORCE"] = "1"
    try:
        got = block.apply(variables, x)   # fused path, interpret mode
    finally:
        os.environ.pop("RS_VAN_FUSED_FORCE", None)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=5e-4, atol=5e-4)
