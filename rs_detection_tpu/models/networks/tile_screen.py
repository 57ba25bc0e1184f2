"""Tile screen: a tiny objectness net for sparse-scene serving.

Production remote-sensing scenes are mostly empty — ocean, fields,
forest. The flagship detector costs ~21 ms per 1024^2 tile on a v5e
chip (docs/roofline.md), and spending that on tiles with nothing in
them is the single largest removable cost in scene serving: the
roofline's conclusion is that past the ~70-90 tiles/s engineered
ceiling, throughput gains must come from *removing work*, not
optimizing it.

``TileScreen`` is a <1 GFLOP convnet that scores every tile of a
scene for "contains any object" in one batched pass (≈1 ms per
batch-16 of 1024^2 tiles, <5% of detector cost), so the detector only
runs on tiles that need it. Two selection modes (both in
``data/scene.py`` / ``bench.py --scene-sparse``):

* **budget** (TPU-native): serve the top-K scoring tiles per scene —
  K is static, so screen + select + detect compiles as one program
  with no host round-trip (``lax.top_k`` + gather).
* **thresh**: keep tiles with sigmoid(score) >= t — variable work,
  host-side index selection (the scores are a few bytes per scene).

The screen is OFF unless configured, and is an accuracy-auditable
component: ``tools/train_screen.py`` trains it on the same tiled
datasets the detector uses (label = tile has any GT), and its recall
at the chosen operating point bounds the detection recall cost
exactly (a screened-out tile is an empty prediction).

This is a capability the reference does not have (its test flow runs
every tile, ``python/jdet/runner/runner.py:131-150``); it exists
because the TPU cost model rewards batched, static-shape early
rejection.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from ...utils.registry import MODELS
from ..utils.modules import kaiming_normal_fanout


@MODELS.register_module()
class TileScreen(nn.Module):
    """[B, S, S, 3] normalized tiles -> [B] objectness logits.

    avg-pool ``pool``x, then a stride-2 conv ladder; the head is a
    1x1 conv to 1 channel and a spatial max — "the most object-like
    location in the tile" — so supervision (tile-level BCE) does not
    have to localize, only detect.

    GroupNorm (not BN): scores must not depend on which tiles share a
    batch, and eval == train mode keeps the dataset path trivial.
    """

    channels: Sequence[int] = (16, 32, 64, 128)
    pool: int = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.pool > 1:
            x = nn.avg_pool(x, (self.pool, self.pool),
                            (self.pool, self.pool))
        for c in self.channels:
            x = nn.Conv(c, (3, 3), strides=(2, 2), padding=1,
                        use_bias=False,
                        kernel_init=kaiming_normal_fanout(),
                        dtype=x.dtype)(x)
            x = nn.GroupNorm(num_groups=min(8, c), dtype=x.dtype)(x)
            x = nn.relu(x)
        logit_map = nn.Conv(1, (1, 1),
                            kernel_init=kaiming_normal_fanout(),
                            dtype=x.dtype)(x)
        return jnp.max(logit_map, axis=(1, 2, 3)).astype(jnp.float32)


def screen_loss(logits, labels) -> Tuple[jnp.ndarray, dict]:
    """Tile-level BCE-with-logits. ``labels`` float {0,1} [B]."""
    z = logits
    y = labels.astype(jnp.float32)
    # numerically stable log-sigmoid form
    loss = jnp.maximum(z, 0) - z * y + jnp.log1p(jnp.exp(-jnp.abs(z)))
    acc = jnp.mean(((z > 0).astype(jnp.float32) == y)
                   .astype(jnp.float32))
    return loss.mean(), dict(screen_loss=loss.mean(), screen_acc=acc)
