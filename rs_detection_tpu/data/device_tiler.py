"""On-device scene tiler: the offline host tiler's sliding-window cut
as one jit-compiled XLA program.

The reference cuts large scenes into overlapping tiles offline with a
multiprocess host pipeline (``ImgSplit_multi_process.py``; our host
port is ``devkits/img_split.py``). For serving, that puts a host
decode/copy pass between the scene and the model. This module moves
the cut onto the device: one ``device_put`` of the raw scene, then a
jitted stack of static ``dynamic_slice`` windows produces the padded
tile batch directly in HBM — the tiler becomes part of the compiled
input pipeline and XLA fuses the (uint8) slices with the model's
on-device normalize.

Window semantics are IDENTICAL to the host tiler
(``img_split.py:SplitSingle``, reference
``ImgSplit_multi_process.py:263-279``): ``slide = subsize - gap``,
positions advance by ``slide`` and the final window clamps to
``dim - subsize``; tiles at the right/bottom edge of a scene smaller
than ``subsize`` are zero-padded (the loader's pad-to-tile behavior).
Tile offsets are returned so detections can be mapped back to scene
coordinates (the ``result_merge`` convention ``name__rate__left___up``).
"""

from __future__ import annotations

import functools
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def tile_positions(dim: int, subsize: int, slide: int) -> List[int]:
    """Window start positions along one axis — the exact loop of
    ``img_split.py:SplitSingle`` (clamped final window, no
    duplicates)."""
    pos = []
    left = 0
    while left < dim:
        if left + subsize >= dim:
            left = max(dim - subsize, 0)
        pos.append(left)
        if left + subsize >= dim:
            break
        left += slide
    return pos


@functools.partial(jax.jit, static_argnames=("subsize", "gap"))
def _tile_scene_impl(scene, subsize: int, gap: int):
    h, w = scene.shape[:2]
    c = scene.shape[2]
    slide = subsize - gap
    lefts = tile_positions(w, subsize, slide)
    ups = tile_positions(h, subsize, slide)
    hp = max(h, subsize)
    wp = max(w, subsize)
    if (hp, wp) != (h, w):
        scene = jnp.pad(scene, ((0, hp - h), (0, wp - w), (0, 0)))
    tiles = jnp.stack([
        jax.lax.dynamic_slice(scene, (u, l, 0), (subsize, subsize, c))
        for u in ups for l in lefts])
    return tiles


def tile_scene(scene, subsize: int = 1024, gap: int = 200
               ) -> Tuple[jnp.ndarray, np.ndarray]:
    """Cut one scene into the padded tile batch, on device.

    Args:
      scene: [H, W, C] array (uint8 or float; stays in its dtype — at
        uint8 the transfer is 4x smaller and normalize fuses into the
        model's first conv).
      subsize, gap: reference tiling parameters (1024/200 for the
        DOTA/FAIR recipes).

    Returns:
      (tiles [N, subsize, subsize, C] on device,
       offsets [N, 2] int64 numpy — (left, up) per tile, host-side
       metadata for result merging).
    """
    h, w = int(scene.shape[0]), int(scene.shape[1])
    slide = subsize - gap
    lefts = tile_positions(w, subsize, slide)
    ups = tile_positions(h, subsize, slide)
    offsets = np.asarray([(lf, up) for up in ups for lf in lefts],
                         np.int64)
    return _tile_scene_impl(scene, subsize, gap), offsets
