"""Raw-scene test dataset: tiling happens ON DEVICE.

The reference test flow requires an offline multiprocess split pass
(``ImgSplit_multi_process.py``) before inference can start. This
dataset takes the raw large scenes directly: each scene is transferred
once (uint8), cut into the overlapping tile grid by the jit-compiled
``device_tiler`` and normalized on device — the tiler is part of the
compiled input pipeline (BASELINE north star). It emits the exact
``(images, targets, metas)`` contract of ``ImageDataset`` with
ImgSplit-style tile names (``name__rate__left___up``), so
``Runner.test``'s flip-TTA and tile-merge submission path work
unchanged on top of it.
"""

from __future__ import annotations

import functools
import os
from typing import Iterator, Optional

import numpy as np

from ..utils.registry import DATASETS
from .device_resize import resize_cubic
from .device_tiler import tile_scene
from .image import list_images
from .io import load_rgb


@functools.lru_cache(maxsize=1)
def _normalize_tiles_jit():
    """One module-level jitted normalize (+ TTA flips): repeated
    ``batches()`` calls hit the same trace cache instead of re-tracing
    a fresh closure each epoch. Built lazily so importing the data
    package does not pull in jax."""
    import jax
    import jax.numpy as jnp

    @functools.partial(jax.jit, static_argnames=("to_bgr", "flip_mode"))
    def impl(t, mean, std, to_bgr, flip_mode):
        t = t.astype(jnp.float32)
        if to_bgr:
            t = t[..., ::-1]
        t = (t - mean) / std
        if flip_mode:
            if "H" in flip_mode:
                t = t[:, :, ::-1]
            if "V" in flip_mode:
                t = t[:, ::-1]
        return t

    return impl


def _normalize_tiles(tiles, mean, std, to_bgr: bool,
                     flip_mode: Optional[str]):
    return _normalize_tiles_jit()(tiles, mean, std, to_bgr, flip_mode)


@DATASETS.register_module()
class SceneDataset:
    def __init__(self, images_dir=None, images_file=None,
                 subsize: int = 1024, gap: int = 200, rate: float = 1.0,
                 rates=None, dataset_type: str = "DOTA",
                 batch_size: int = 1,
                 mean=(123.675, 116.28, 103.53),
                 std=(58.395, 57.12, 57.375), to_bgr: bool = False,
                 num_workers: int = 0, shuffle: bool = False,
                 max_gt: int = 1, screen=None, **kw):
        self.images = (list_images(images_dir) if images_dir
                       else list(images_file))
        self.subsize = subsize
        self.gap = gap
        self.rate = rate
        # multi-scale serving (reference recipe rates 0.5/1.0/1.5,
        # ImgSplit_multi_process resize): each scene transfers ONCE at
        # full resolution and is resized ON DEVICE per rate with
        # cv2-INTER_CUBIC-exact bicubic (data/device_resize.py)
        self.rates = [float(r) for r in rates] if rates else None
        self.dataset_type = dataset_type
        self.batch_size = batch_size
        self.mean = np.asarray(mean, np.float32)
        self.std = np.asarray(std, np.float32)
        self.to_bgr = to_bgr
        self.total_len = len(self.images)
        # sparse-scene screening (models/networks/tile_screen.py):
        # screen=dict(checkpoint=..., thresh=0.5) or
        # screen=dict(checkpoint=..., budget=K) — only tiles the tiny
        # objectness net keeps reach the detector. OFF by default.
        self.screen = dict(screen) if screen else None
        if self.screen and ("thresh" not in self.screen
                            and "budget" not in self.screen):
            raise ValueError(
                "SceneDataset screen= needs 'thresh' or 'budget'")
        self._screen_fn = None
        self._screen_vars = None
        self.screen_stats = dict(total=0, kept=0)

    def _screen_setup(self):
        """Lazily build + load the screen net (first batches() call)."""
        import pickle

        import jax
        from flax import serialization

        from ..utils.registry import MODELS, build_from_cfg

        cfg = dict(self.screen.get("model") or {"type": "TileScreen"})
        model = build_from_cfg(cfg, MODELS)
        s = self.subsize
        variables = model.init(jax.random.PRNGKey(0),
                               np.zeros((1, s, s, 3), np.float32))
        ckpt = self.screen.get("checkpoint")
        if ckpt:
            with open(ckpt, "rb") as f:
                data = pickle.load(f)
            sd = data.get("model", data) if isinstance(data, dict) \
                else data
            variables = serialization.from_state_dict(variables, sd)
        elif not self.screen.get("allow_random_init"):
            raise ValueError(
                "SceneDataset screen= without checkpoint= would "
                "screen with random weights; train one with "
                "tools/train_screen.py or set allow_random_init=True "
                "(tests/benchmarks only)")
        self._screen_vars = variables
        self._screen_fn = jax.jit(
            lambda v, t: model.apply(v, t.astype(t.dtype)))

    def _screen_select(self, tiles) -> np.ndarray:
        """Score a scene-variant's tiles; return kept tile indices
        (ascending). Tile count is padded to a multiple of 8 so the
        jitted screen sees a bounded set of shapes across scenes."""
        import jax.numpy as jnp

        if self._screen_fn is None:
            self._screen_setup()
        n = tiles.shape[0]
        pad = (-n) % 8
        t = jnp.pad(tiles, ((0, pad), (0, 0), (0, 0), (0, 0))) \
            if pad else tiles
        logits = np.asarray(self._screen_fn(self._screen_vars, t))[:n]
        if "budget" in self.screen:
            k = min(int(self.screen["budget"]), n)
            idx = np.sort(np.argsort(-logits)[:k])
        else:
            p = 1.0 / (1.0 + np.exp(-logits))
            idx = np.nonzero(p >= float(self.screen["thresh"]))[0]
        self.screen_stats["total"] += n
        self.screen_stats["kept"] += len(idx)
        return idx

    def __len__(self):
        return self.total_len

    def _load_scene(self, path: str) -> np.ndarray:
        from PIL import Image

        Image.MAX_IMAGE_PIXELS = None  # DOTA scenes exceed PIL default
        img = load_rgb(path)
        if self.rate != 1.0:
            img = img.resize((int(round(img.width * self.rate)),
                              int(round(img.height * self.rate))),
                             Image.BICUBIC)
        return np.asarray(img, np.uint8)

    def batches(self, flip_mode: Optional[str] = None) -> Iterator:
        """Yield (images [B, S, S, 3] f32 on device, targets, metas) —
        device-tiled + device-normalized; tile metas carry the
        ImgSplit naming for the merge step.

        Tiles STREAM ACROSS SCENE BOUNDARIES: a batch may mix the tail
        of one scene with the head of the next, so only the dataset's
        very last batch carries padding. (Per-scene padding measured a
        44% throughput loss on 3x3-grid scenes whose 9 tiles fill 9/16
        of two batch-8 slots — docs/perf_notes.md scene bullet.)"""
        import jax.numpy as jnp

        mean = jnp.asarray(self.mean)
        std = jnp.asarray(self.std)
        s = self.subsize
        bs = self.batch_size
        rate_tag = str(float(self.rate))     # ImgSplit names use "1.0"
        # full collate_batch target schema (empty GT), shared
        targets = dict(
            rboxes=jnp.zeros((bs, 1, 5), jnp.float32),
            hboxes=jnp.zeros((bs, 1, 4), jnp.float32),
            polys=jnp.zeros((bs, 1, 8), jnp.float32),
            labels=jnp.zeros((bs, 1), jnp.int32),
            gt_mask=jnp.zeros((bs, 1), bool),
            img_hw=jnp.full((bs, 2), float(s), jnp.float32),
            scale_factor=jnp.ones((bs,), jnp.float32))

        pend_tiles = None                    # device [n, S, S, 3] f32
        pend_metas: list = []
        for path in self.images:
            if self.rates:
                # one full-res transfer; per-rate resize on device
                from PIL import Image

                Image.MAX_IMAGE_PIXELS = None
                full = jnp.asarray(
                    np.asarray(load_rgb(path), np.uint8))
                variants = []
                for r in self.rates:
                    if r == 1.0:
                        variants.append((r, full))
                    else:
                        oh = int(round(full.shape[0] * r))
                        ow = int(round(full.shape[1] * r))
                        variants.append(
                            (r, resize_cubic(full, oh, ow)))
            else:
                variants = [(float(self.rate),
                             jnp.asarray(self._load_scene(path)))]
            stem = os.path.splitext(os.path.basename(path))[0]
            for r, scene in variants:
                tiles_u8, offsets = tile_scene(scene, s, self.gap)
                tiles = _normalize_tiles(tiles_u8, mean, std,
                                         self.to_bgr, flip_mode)
                if self.screen is not None:
                    # score the UNFLIPPED tiles so every flip-TTA pass
                    # keeps the same tile set (merge sees consistent
                    # coverage per scene)
                    screen_in = tiles if not flip_mode else \
                        _normalize_tiles(tiles_u8, mean, std,
                                         self.to_bgr, None)
                    keep = self._screen_select(screen_in)
                    if len(keep) == 0:
                        continue
                    tiles = tiles[np.asarray(keep)]
                    offsets = [offsets[i] for i in keep]
                rtag = str(r) if self.rates else rate_tag
                for lf, up in offsets:
                    tile_name = f"{stem}__{rtag}__{lf}___{up}.png"
                    pend_metas.append(dict(
                        filename=tile_name,
                        # the merge step parses tile offsets from the
                        # img_file BASENAME (data_merge.py
                        # prepare_data)
                        img_file=tile_name,
                        scene_file=path,
                        img_size=(s, s), ori_img_size=(s, s),
                        scale_factor=1.0,
                        **(dict(flip_mode=flip_mode)
                           if flip_mode else {})))
                pend_tiles = (tiles if pend_tiles is None
                              else jnp.concatenate([pend_tiles,
                                                    tiles]))
                while pend_tiles.shape[0] >= bs:
                    # fresh dict per batch: consumers may add keys
                    yield (pend_tiles[:bs], dict(targets),
                           pend_metas[:bs])
                    pend_tiles = pend_tiles[bs:]
                    pend_metas = pend_metas[bs:]
        n_left = 0 if pend_tiles is None else pend_tiles.shape[0]
        if n_left:
            batch = jnp.pad(pend_tiles, ((0, bs - n_left), (0, 0),
                                         (0, 0), (0, 0)))
            yield (batch, dict(targets),
                   pend_metas + [None] * (bs - n_left))
