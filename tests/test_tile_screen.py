"""Sparse-scene screening: TileScreen net + SceneDataset integration.

The screen's contract: only tiles it keeps reach the detector, the
kept set is identical across flip-TTA passes, and with the screen
unset SceneDataset behaves exactly as before (default off). Recall is
auditable: train on rendered tiles, verify object tiles are kept.
"""

import os
import pickle
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def _render_tile(rng, size, with_object):
    """Dark background; positives get a bright rectangle."""
    tile = (rng.rand(size, size, 3) * 40).astype(np.uint8)
    if with_object:
        cx, cy = rng.randint(size // 4, 3 * size // 4, 2)
        w, h = rng.randint(size // 8, size // 4, 2)
        tile[max(0, cy - h // 2):cy + h // 2,
             max(0, cx - w // 2):cx + w // 2] = (230, 220, 210)
    return tile


def _train_screen(rng, size=64, iters=120):
    import jax
    import optax

    from rs_detection_tpu.models.networks.tile_screen import (
        TileScreen, screen_loss)

    model = TileScreen(channels=(8, 16), pool=2)
    mean = np.asarray([123.675, 116.28, 103.53], np.float32)
    std = np.asarray([58.395, 57.12, 57.375], np.float32)

    def batch(n=16):
        labels = rng.rand(n) < 0.5
        tiles = np.stack([_render_tile(rng, size, bool(l))
                          for l in labels]).astype(np.float32)
        return (tiles - mean) / std, labels.astype(np.float32)

    x0, _ = batch(2)
    variables = model.init(jax.random.PRNGKey(0), x0)
    tx = optax.adam(3e-3)
    opt_state = tx.init(variables["params"])

    @jax.jit
    def step(params, opt_state, x, y):
        def lossfn(p):
            return screen_loss(model.apply({"params": p}, x), y)

        (_, m), g = jax.value_and_grad(lossfn, has_aux=True)(params)
        up, opt_state = tx.update(g, opt_state, params)
        return optax.apply_updates(params, up), opt_state, m

    params = variables["params"]
    for _ in range(iters):
        x, y = batch()
        params, opt_state, m = step(params, opt_state, x, y)
    x, y = batch(32)
    import jax.numpy as jnp  # noqa: F401

    logits = model.apply({"params": params}, x)
    acc = float(((np.asarray(logits) > 0) == (y > 0.5)).mean())
    return model, {"params": params}, acc, (mean, std)


class TestTileScreenNet:
    def test_shapes_and_loss(self):
        import jax

        from rs_detection_tpu.models.networks.tile_screen import (
            TileScreen, screen_loss)

        model = TileScreen(channels=(8, 16), pool=2)
        x = np.zeros((3, 64, 64, 3), np.float32)
        v = model.init(jax.random.PRNGKey(0), x)
        logits = model.apply(v, x)
        assert logits.shape == (3,)
        loss, metrics = screen_loss(logits,
                                    np.array([0.0, 1.0, 1.0]))
        assert np.isfinite(float(loss))
        assert 0.0 <= float(metrics["screen_acc"]) <= 1.0

    def test_registered(self):
        from rs_detection_tpu.utils.registry import MODELS, \
            build_from_cfg

        m = build_from_cfg({"type": "TileScreen",
                            "channels": (8,)}, MODELS)
        assert m.channels == (8,)

    def test_trains_to_separation(self):
        rng = np.random.RandomState(0)
        _, _, acc, _ = _train_screen(rng)
        assert acc >= 0.9, f"screen failed to learn: acc={acc}"


def _scene_with_objects(rng, size, subsize, gap, object_windows):
    """A scene whose tile grid has objects only in the given
    (left, up) windows."""
    from rs_detection_tpu.data.device_tiler import tile_positions

    scene = (rng.rand(size, size, 3) * 40).astype(np.uint8)
    lefts = tile_positions(size, subsize, subsize - gap)
    ups = tile_positions(size, subsize, subsize - gap)
    grid = [(lf, up) for up in ups for lf in lefts]
    for (lf, up) in object_windows:
        # center of the window, well inside it (gap-safe)
        cy, cx = up + subsize // 2, lf + subsize // 2
        scene[cy - 6:cy + 6, cx - 10:cx + 10] = (230, 220, 210)
    return scene, grid


class TestSceneScreening:
    def _write_ckpt(self, tmp_path, variables):
        from flax import serialization

        path = tmp_path / "screen.pkl"
        with open(path, "wb") as f:
            pickle.dump(dict(model=serialization.to_state_dict(
                variables)), f)
        return str(path)

    def test_thresh_keeps_object_tiles_only(self, tmp_path):
        from PIL import Image

        from rs_detection_tpu.data.scene import SceneDataset

        rng = np.random.RandomState(1)
        model, variables, acc, (mean, std) = _train_screen(rng)
        assert acc >= 0.9
        subsize, gap = 64, 16
        # 3x3 grid at 176^2; objects in 2 of 9 windows
        obj = [(0, 0), (112, 112)]
        scene, grid = _scene_with_objects(rng, 176, subsize, gap, obj)
        d = tmp_path / "scenes"
        d.mkdir()
        Image.fromarray(scene).save(d / "S.png")
        ckpt = self._write_ckpt(tmp_path, variables)

        sds = SceneDataset(
            images_dir=str(d), subsize=subsize, gap=gap, batch_size=2,
            mean=mean, std=std,
            screen=dict(model=dict(type="TileScreen",
                                   channels=(8, 16), pool=2),
                        checkpoint=ckpt, thresh=0.5))
        kept = [m["filename"] for _, _, metas in sds.batches()
                for m in metas if m is not None]
        want = {f"S__1.0__{lf}___{up}.png" for lf, up in obj}
        got = set(kept)
        # object windows must be kept (recall); overlapping windows
        # that also see the object may legitimately be kept too
        assert want <= got, f"missed object tiles: {want - got}"
        assert sds.screen_stats["total"] == len(grid)
        assert sds.screen_stats["kept"] == len(got)
        # empty-corner window must be rejected (the screen separates)
        assert "S__1.0__112___0.png" not in got

    def test_budget_topk(self, tmp_path):
        from PIL import Image

        from rs_detection_tpu.data.scene import SceneDataset

        rng = np.random.RandomState(2)
        model, variables, acc, (mean, std) = _train_screen(rng)
        subsize, gap = 64, 16
        obj = [(48, 0), (0, 96)]
        scene, grid = _scene_with_objects(rng, 176, subsize, gap, obj)
        d = tmp_path / "scenes"
        d.mkdir()
        Image.fromarray(scene).save(d / "S.png")
        ckpt = self._write_ckpt(tmp_path, variables)
        sds = SceneDataset(
            images_dir=str(d), subsize=subsize, gap=gap, batch_size=2,
            mean=mean, std=std,
            screen=dict(model=dict(type="TileScreen",
                                   channels=(8, 16), pool=2),
                        checkpoint=ckpt, budget=2))
        kept = [m["filename"] for _, _, metas in sds.batches()
                for m in metas if m is not None]
        assert len(kept) == 2
        assert sds.screen_stats["kept"] == 2
        # overlapping windows can both see an object — the invariant
        # is: every kept tile actually contains object pixels
        obj_tiles = {
            f"S__1.0__{lf}___{up}.png" for lf, up in grid
            if scene[up:up + subsize, lf:lf + subsize].max() > 200}
        assert len(obj_tiles) >= 2
        assert set(kept) <= obj_tiles

    def test_flip_tta_same_tile_set(self, tmp_path):
        from PIL import Image

        from rs_detection_tpu.data.scene import SceneDataset

        rng = np.random.RandomState(3)
        model, variables, acc, (mean, std) = _train_screen(rng)
        subsize, gap = 64, 16
        scene, _ = _scene_with_objects(rng, 176, subsize, gap,
                                       [(56, 56)])
        d = tmp_path / "scenes"
        d.mkdir()
        Image.fromarray(scene).save(d / "S.png")
        ckpt = self._write_ckpt(tmp_path, variables)
        sds = SceneDataset(
            images_dir=str(d), subsize=subsize, gap=gap, batch_size=2,
            mean=mean, std=std,
            screen=dict(model=dict(type="TileScreen",
                                   channels=(8, 16), pool=2),
                        checkpoint=ckpt, thresh=0.5))
        base = {m["filename"] for _, _, metas in sds.batches()
                for m in metas if m is not None}
        flip = {m["filename"] for _, _, metas in sds.batches("H")
                for m in metas if m is not None}
        assert base == flip

    def test_default_off_and_validation(self, tmp_path):
        from PIL import Image

        from rs_detection_tpu.data.scene import SceneDataset

        rng = np.random.RandomState(4)
        d = tmp_path / "scenes"
        d.mkdir()
        Image.fromarray((rng.rand(96, 96, 3) * 255).astype(np.uint8)
                        ).save(d / "S.png")
        sds = SceneDataset(images_dir=str(d), subsize=64, gap=16,
                           batch_size=2)
        n = sum(1 for _, _, metas in sds.batches()
                for m in metas if m is not None)
        assert n == 4  # full 2x2 grid, nothing screened
        with pytest.raises(ValueError, match="thresh"):
            SceneDataset(images_dir=str(d), subsize=64, gap=16,
                         screen=dict(checkpoint="x.pkl"))
        sds = SceneDataset(images_dir=str(d), subsize=64, gap=16,
                           batch_size=2, screen=dict(thresh=0.5))
        with pytest.raises(ValueError, match="random weights"):
            list(sds.batches())
