"""Deformable (position-sensitive) RoI pooling — DCN v2's pooling op.

Capability parity with the reference ``dcn_v2_pooling`` CUDA kernel and
``DCNPooling`` module (``python/jdet/ops/dcn_v2.py:808-1177, 1374``):
each output bin averages ``sample_per_part²`` bilinear samples taken at
the bin's grid position shifted by a learned per-part (x, y) offset
scaled by ``trans_std`` and the roi size; the ``DCNPooling`` module
first pools without offsets, predicts per-bin offsets + a sigmoid mask
with a 3-layer FC branch (zero-initialized last layer), then re-pools
with the offsets and applies the mask.

TPU-first: one dense gather-based formulation, static shapes
([R, P, P, S, S] sample lattice), out-of-range samples masked and the
bin average divided by the in-range count — jit/vmap/grad-safe with no
atomics (the CUDA backward's scatter-adds become XLA's gather
transpose).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..utils.registry import BRICKS


def deform_roi_pooling(feats: jnp.ndarray, rois: jnp.ndarray,
                       offsets: jnp.ndarray | None,
                       output_size: int = 7,
                       spatial_scale: float = 1.0,
                       output_dim: int | None = None,
                       group_size: int = 1,
                       part_size: int | None = None,
                       sample_per_part: int = 4,
                       trans_std: float = 0.0) -> jnp.ndarray:
    """Args:
      feats: [N, H, W, C] (NHWC).
      rois: [R, 5] (batch_idx, x1, y1, x2, y2) in image coords.
      offsets: [R, 2, part, part] (x offsets then y offsets) or None.
      output_dim: output channels (default C / group_size²).

    Returns [R, P, P, output_dim].
    """
    n, height, width, c = feats.shape
    p = output_size
    s = sample_per_part
    gs = group_size
    part = part_size or p
    if output_dim is None:
        output_dim = c // (gs * gs)

    batch_idx = rois[:, 0].astype(jnp.int32)
    # reference rounds roi corners to the integer grid
    x1 = jnp.round(rois[:, 1]) * spatial_scale - 0.5
    y1 = jnp.round(rois[:, 2]) * spatial_scale - 0.5
    x2 = (jnp.round(rois[:, 3]) + 1.0) * spatial_scale - 0.5
    y2 = (jnp.round(rois[:, 4]) + 1.0) * spatial_scale - 0.5
    roi_w = jnp.maximum(x2 - x1, 0.1)
    roi_h = jnp.maximum(y2 - y1, 0.1)
    bin_w = roi_w / p                                   # [R]
    bin_h = roi_h / p
    sub_w = bin_w / s
    sub_h = bin_h / s

    ph = jnp.arange(p)
    pw = jnp.arange(p)
    part_h = jnp.floor(ph.astype(jnp.float32) / p * part).astype(
        jnp.int32)                                      # [P]
    part_w = jnp.floor(pw.astype(jnp.float32) / p * part).astype(
        jnp.int32)
    if offsets is None:
        tx = jnp.zeros((rois.shape[0], p, p), jnp.float32)
        ty = tx
    else:
        off = offsets.astype(jnp.float32)
        tx = off[:, 0][:, part_h][:, :, part_w] * trans_std  # [R, P, P]
        ty = off[:, 1][:, part_h][:, :, part_w] * trans_std

    # sample lattice [R, P(h), P(w), S(h), S(w)]
    ih = jnp.arange(s, dtype=jnp.float32)
    iw = jnp.arange(s, dtype=jnp.float32)
    wstart = (x1[:, None, None] + pw[None, None, :]
              * bin_w[:, None, None] + tx * roi_w[:, None, None])
    hstart = (y1[:, None, None] + ph[None, :, None]
              * bin_h[:, None, None] + ty * roi_h[:, None, None])
    wpos = (wstart[..., None, None]
            + iw[None, None, None, None, :] * sub_w[:, None, None,
                                                    None, None])
    hpos = (hstart[..., None, None]
            + ih[None, None, None, :, None] * sub_h[:, None, None,
                                                    None, None])

    in_range = ((wpos > -0.5) & (wpos < width - 0.5)
                & (hpos > -0.5) & (hpos < height - 0.5))
    wpos = jnp.clip(wpos, 0.0, width - 1.0)
    hpos = jnp.clip(hpos, 0.0, height - 1.0)

    w0 = jnp.floor(wpos).astype(jnp.int32)
    h0 = jnp.floor(hpos).astype(jnp.int32)
    w1 = jnp.minimum(w0 + 1, width - 1)
    h1 = jnp.minimum(h0 + 1, height - 1)
    aw = wpos - w0
    ah = hpos - h0

    # position-sensitive channel group per bin
    gh = jnp.floor(ph.astype(jnp.float32) / p * gs).astype(jnp.int32)
    gw = jnp.floor(pw.astype(jnp.float32) / p * gs).astype(jnp.int32)
    # channel start index per (ph, pw): (ctop*gs+gh)*gs+gw layout ->
    # select a [output_dim] slice per bin
    flat = feats.reshape(n * height * width, c)

    def gather(hh, ww):
        idx = (batch_idx[:, None, None, None, None] * height + hh) \
            * width + ww
        return flat[idx]                                # [R,P,P,S,S,C]

    v00 = gather(h0, w0)
    v01 = gather(h0, w1)
    v10 = gather(h1, w0)
    v11 = gather(h1, w1)
    aw_ = aw[..., None]
    ah_ = ah[..., None]
    val = ((v00 * (1 - aw_) + v01 * aw_) * (1 - ah_)
           + (v10 * (1 - aw_) + v11 * aw_) * ah_)
    val = val * in_range[..., None]
    cnt = jnp.maximum(in_range.sum((-1, -2)), 1)        # [R,P,P]
    pooled = val.sum((-2, -3)) / cnt[..., None]          # [R,P,P,C]

    if gs == 1:
        return pooled[..., :output_dim]
    # position-sensitive: bin (ph, pw) reads channels
    # [(ctop*gs+gh)*gs+gw] for ctop in range(output_dim)
    ctop = jnp.arange(output_dim)
    chan = ((ctop[None, None, :] * gs + gh[:, None, None]) * gs
            + gw[None, :, None])                         # [P,P,D]
    return jnp.take_along_axis(
        pooled, jnp.broadcast_to(chan[None],
                                 pooled.shape[:3] + (output_dim,)),
        axis=-1)


@BRICKS.register_module()
class DCNPooling(nn.Module):
    """Deformable RoI pooling with a learned offset/mask branch
    (reference ``DCNPooling``, ``dcn_v2.py:1374``)."""

    spatial_scale: float = 1.0 / 16
    pooled_size: int = 7
    output_dim: int = 256
    no_trans: bool = False
    group_size: int = 1
    part_size: Any = None
    sample_per_part: int = 4
    trans_std: float = 0.0
    deform_fc_dim: int = 1024

    @nn.compact
    def __call__(self, feats, rois):
        p = self.pooled_size
        pool = lambda off: deform_roi_pooling(
            feats, rois, off, output_size=p,
            spatial_scale=self.spatial_scale,
            output_dim=self.output_dim, group_size=self.group_size,
            part_size=self.part_size,
            sample_per_part=self.sample_per_part,
            trans_std=self.trans_std)
        base = pool(None)                                # [R,P,P,D]
        if self.no_trans:
            return base
        x = base.reshape(base.shape[0], -1)
        x = nn.relu(nn.Dense(self.deform_fc_dim, name="fc1")(x))
        x = nn.relu(nn.Dense(self.deform_fc_dim, name="fc2")(x))
        om = nn.Dense(p * p * 3, kernel_init=nn.initializers.zeros,
                      bias_init=nn.initializers.zeros, name="fc3")(x)
        om = om.reshape(-1, 3, p, p)
        offsets = om[:, :2]
        mask = jax.nn.sigmoid(om[:, 2])                  # [R,P,P]
        out = pool(offsets)
        return out * mask[..., None]
