"""Shape/behavior tests for ResNet, VAN, FPN."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rs_detection_tpu.models.backbones.resnet import ResNet
from rs_detection_tpu.models.backbones.van import VAN
from rs_detection_tpu.models.necks.fpn import FPN


@pytest.fixture(scope="module")
def x64():
    return jnp.asarray(np.random.RandomState(0)
                       .rand(1, 64, 64, 3).astype(np.float32))


class TestResNet:
    def test_r18_shapes(self, x64):
        model = ResNet(depth=18)
        params = model.init(jax.random.PRNGKey(0), x64)
        outs = model.apply(params, x64)
        assert [o.shape for o in outs] == [
            (1, 16, 16, 64), (1, 8, 8, 128), (1, 4, 4, 256), (1, 2, 2, 512)]

    @pytest.mark.slow
    def test_r50_shapes(self, x64):
        model = ResNet(depth=50)
        params = model.init(jax.random.PRNGKey(0), x64)
        outs = model.apply(params, x64)
        assert [o.shape[-1] for o in outs] == [256, 512, 1024, 2048]
        assert outs[0].shape[1] == 16

    def test_return_stages(self, x64):
        model = ResNet(depth=18, return_stages=("layer3", "layer4"))
        params = model.init(jax.random.PRNGKey(0), x64)
        outs = model.apply(params, x64)
        assert len(outs) == 2

    def test_train_mode_updates_batchstats(self, x64):
        model = ResNet(depth=18, norm_eval=False)
        variables = model.init(jax.random.PRNGKey(0), x64, train=True)
        _, new_state = model.apply(variables, x64, train=True,
                                   mutable=["batch_stats"])
        assert "batch_stats" in new_state


class TestVAN:
    def test_b0_shapes(self, x64):
        model = VAN(embed_dims=(32, 64, 160, 256), depths=(1, 1, 1, 1))
        params = model.init(jax.random.PRNGKey(0), x64)
        outs = model.apply(params, x64)
        assert [o.shape for o in outs] == [
            (1, 16, 16, 32), (1, 8, 8, 64), (1, 4, 4, 160), (1, 2, 2, 256)]

    def test_b3_config(self):
        from rs_detection_tpu.models.backbones.van import _VAN_ARCH
        assert _VAN_ARCH["van_b3"]["depths"] == (3, 5, 27, 3)
        assert _VAN_ARCH["van_b3"]["embed_dims"] == (64, 128, 320, 512)

    @pytest.mark.slow
    def test_grads(self, x64):
        model = VAN(embed_dims=(8, 16, 32, 64), depths=(1, 1, 1, 1))
        params = model.init(jax.random.PRNGKey(0), x64)

        def loss(p):
            return sum(o.sum() for o in model.apply(p, x64))

        g = jax.grad(loss)(params)
        leaves = jax.tree_util.tree_leaves(g)
        assert all(np.isfinite(np.asarray(l)).all() for l in leaves)


class TestFPN:
    def test_standard_5level(self):
        rng = np.random.RandomState(1)
        ins = tuple(jnp.asarray(rng.rand(1, s, s, c).astype(np.float32))
                    for s, c in [(32, 16), (16, 32), (8, 64), (4, 128)])
        fpn = FPN(in_channels=(16, 32, 64, 128), out_channels=16,
                  num_outs=5)
        params = fpn.init(jax.random.PRNGKey(0), ins)
        outs = fpn.apply(params, ins)
        assert len(outs) == 5
        assert [o.shape[1] for o in outs] == [32, 16, 8, 4, 2]
        assert all(o.shape[-1] == 16 for o in outs)

    def test_extra_convs_on_input(self):
        rng = np.random.RandomState(1)
        ins = tuple(jnp.asarray(rng.rand(1, s, s, c).astype(np.float32))
                    for s, c in [(16, 64), (8, 128), (4, 256)])
        fpn = FPN(in_channels=(64, 128, 256), out_channels=32, num_outs=5,
                  add_extra_convs="on_input")
        params = fpn.init(jax.random.PRNGKey(0), ins)
        outs = fpn.apply(params, ins)
        assert [o.shape[1] for o in outs] == [16, 8, 4, 2, 1]

    def test_top_down_information_flow(self):
        # top-level signal should propagate into the finest output
        ins = (jnp.zeros((1, 8, 8, 4)), jnp.ones((1, 4, 4, 8)))
        fpn = FPN(in_channels=(4, 8), out_channels=4, num_outs=2)
        params = fpn.init(jax.random.PRNGKey(0), ins)
        outs = fpn.apply(params, ins)
        assert np.abs(np.asarray(outs[0])).sum() > 0


class TestSK2Res2Net:
    pytestmark = pytest.mark.slow

    def test_shapes_and_sk_gate(self, x64):
        from rs_detection_tpu.models.backbones.sk2res2net import SK2Res2Net

        m = SK2Res2Net(depth=50)
        vars_ = jax.jit(lambda x: m.init(jax.random.PRNGKey(0), x))(x64)
        outs = m.apply(vars_, x64)
        assert [o.shape for o in outs] == [
            (1, 16, 16, 256), (1, 8, 8, 512),
            (1, 4, 4, 1024), (1, 2, 2, 2048)]
        # SK gate alpha parameters exist in every block
        flat = jax.tree_util.tree_leaves_with_path(vars_["params"])
        alphas = [p for p, _ in flat if "alpha" in str(p)]
        assert len(alphas) == 3 + 4 + 6 + 3


class TestOtherBackbones:
    pytestmark = pytest.mark.slow

    """Forward-shape coverage for every registered backbone family."""

    def test_swin_nondivisible_windows(self, x64):
        from rs_detection_tpu.models.backbones.swin import Swin

        m = Swin(depths=(1, 1, 1, 1))  # 16x16 stage-0 grid vs ws=7
        v = jax.jit(lambda x: m.init(jax.random.PRNGKey(0), x))(x64)
        outs = m.apply(v, x64)
        assert [o.shape for o in outs] == [
            (1, 16, 16, 96), (1, 8, 8, 192),
            (1, 4, 4, 384), (1, 2, 2, 768)]

    def test_convnext_lsknet_res2net_ssdvgg(self, x64):
        from rs_detection_tpu.models.backbones.convnext import ConvNeXt
        from rs_detection_tpu.models.backbones.lsknet import LSKNet
        from rs_detection_tpu.models.backbones.res2net import Res2Net
        from rs_detection_tpu.models.backbones.ssd_vgg import SSDVGG

        for m, c_last in ((ConvNeXt(), 768), (LSKNet(), 512),
                          (Res2Net(depth=50), 2048)):
            v = jax.jit(lambda x: m.init(jax.random.PRNGKey(0), x))(x64)
            outs = m.apply(v, x64)
            assert outs[-1].shape[-1] == c_last
        m = SSDVGG()
        v = jax.jit(lambda x: m.init(jax.random.PRNGKey(0), x))(x64)
        outs = m.apply(v, x64)
        assert outs[-1].shape[-1] == 1024
