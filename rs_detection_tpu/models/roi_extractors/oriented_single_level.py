"""FPN-level-routing rotated RoI feature extractor.

Capability parity with the reference ``OrientedSingleRoIExtractor``
(``python/jdet/models/roi_extractors/oriented_single_level.py:9-114``):
extend-factor roi inflation, level mapping
``floor(log2(sqrt(w*h)/finest_scale + 1e-6))`` clamped to [0, L-1],
per-level rotated RoIAlign.

TPU-first: instead of boolean-scattering rois per level (dynamic
shapes), every roi is pooled at every level and the result selected by
a one-hot level weight — 4x pooling FLOPs on a tiny 7x7 tensor in
exchange for a single fused static graph (the reference's empty-level
zero-grad trick becomes unnecessary). Also provides the horizontal
``SingleRoIExtractor`` and ``RboxSingleRoIExtractor`` variants
(reference ``single_level.py`` / ``rbox_single_level.py``).
"""

from __future__ import annotations

import os
from typing import Sequence

import jax
import jax.numpy as jnp

from ...ops.pallas_roi_align import roi_align_rotated_pyramid_pallas
from ...ops.roi_align import (roi_align, roi_align_rotated,
                              roi_align_rotated_pyramid)
from ...utils.registry import ROI_EXTRACTORS


def map_roi_levels(scale: jnp.ndarray, num_levels: int,
                   finest_scale: float = 56.0) -> jnp.ndarray:
    lvl = jnp.floor(jnp.log2(scale / finest_scale + 1e-6))
    return jnp.clip(lvl, 0, num_levels - 1).astype(jnp.int32)


@ROI_EXTRACTORS.register_module()
class OrientedSingleRoIExtractor:
    def __init__(self, roi_layer=None, out_channels=256,
                 featmap_strides=(4, 8, 16, 32), extend_factor=(1.0, 1.0),
                 finest_scale=56, impl="auto", fallback_frac=None,
                 big_frac=None):
        if fallback_frac is None:
            fallback_frac = float(os.environ.get(
                "RS_ROI_FALLBACK_FRAC", 0.125))
        if big_frac is None:
            # round-5 static split made this a serving win: 46.68 vs
            # 46.43 t/s e2e AND exact for every tier>=1 roi (big-off
            # saturates the 2000-cap XLA tail on the 17.4%-oversize
            # bench stream and window-clamps the overflow). bench.py
            # sets 0.19 for the dense headline; the LIBRARY default
            # stays 0 because big_frac > 0 switches training to the
            # XLA-vjp backward (pallas_roi_align.py:_pallas_bwd) —
            # set it per-deployment for inference, sized to the
            # workload's tier>=1 fraction plus margin (overflow past
            # n_big falls back to the exact tail, never clamps)
            big_frac = float(os.environ.get("RS_ROI_BIG_FRAC", 0.0))
        roi_layer = roi_layer or {}
        self.output_size = roi_layer.get("output_size", 7)
        self.sampling_ratio = max(int(roi_layer.get("sampling_ratio", 2)), 1)
        self.out_channels = out_channels
        self.featmap_strides = tuple(featmap_strides)
        self.extend_factor = tuple(extend_factor)
        self.finest_scale = finest_scale
        # 'auto' -> Pallas window+MXU kernel on TPU (ops/
        # pallas_roi_align.py), XLA pyramid gather elsewhere; 'xla' /
        # 'pallas' force a path
        self.impl = impl
        self.fallback_frac = fallback_frac
        self.big_frac = big_frac

    @property
    def num_inputs(self):
        return len(self.featmap_strides)

    def __call__(self, feats: Sequence[jnp.ndarray], rois: jnp.ndarray,
                 training: bool = False):
        """Args:
          feats: per-level [N, H_l, W_l, C] features.
          rois: [R, 6] (batch_idx, cx, cy, w, h, theta).

        Returns: [R, P, P, C].
        """
        feats = feats[:self.num_inputs]
        # inflate: reference roi_rescale applies extend_factor[1] to w
        # and extend_factor[0] to h (oriented_single_level.py:73-91)
        ef_h, ef_w = self.extend_factor[0], self.extend_factor[1]
        w = rois[:, 3] * ef_w
        h = rois[:, 4] * ef_h
        rois = jnp.concatenate(
            [rois[:, :3], w[:, None], h[:, None], rois[:, 5:6]], axis=1)
        # training: the kernel has a real Pallas backward (A^T window
        # scatter, ops/pallas_roi_align.py:_pallas_bwd). Measured on
        # v5e (2026-08-18): batch-8 train step 586.1 -> 531.2 ms/iter
        # (1.10x) with in-graph forward parity rel_err 4.4e-5 vs the
        # XLA path (docs/perf_notes.md round-3 log) — default ON;
        # RS_ROI_TRAIN_PALLAS=0 restores the XLA fwd+bwd pair.
        train_pallas = (training
                        and os.environ.get("RS_ROI_TRAIN_PALLAS",
                                           "1") == "1")
        use_pallas = (self.impl == "pallas"
                      or (self.impl == "auto"
                          and (not training or train_pallas)
                          and jax.default_backend() == "tpu"))
        if use_pallas:
            # forcing impl='pallas' off-TPU only makes sense in
            # interpret mode (Mosaic won't compile for CPU/GPU)
            interpret = jax.default_backend() != "tpu"
            return roi_align_rotated_pyramid_pallas(
                list(feats), rois, self.output_size,
                strides=tuple(self.featmap_strides),
                sampling_ratio=self.sampling_ratio,
                finest_scale=float(self.finest_scale),
                fallback_frac=self.fallback_frac,
                big_frac=self.big_frac, interpret=interpret)
        # one gather over the flattened pyramid — each roi sampled only
        # at its own level (see ops/roi_align.py)
        return roi_align_rotated_pyramid(
            list(feats), rois, self.output_size,
            strides=tuple(self.featmap_strides),
            sampling_ratio=self.sampling_ratio,
            finest_scale=float(self.finest_scale))


@ROI_EXTRACTORS.register_module()
class SingleRoIExtractor:
    """Horizontal version (reference ``single_level.py``); rois [R, 5]
    = (batch_idx, x1, y1, x2, y2)."""

    def __init__(self, roi_layer=None, out_channels=256,
                 featmap_strides=(4, 8, 16, 32), finest_scale=56):
        roi_layer = roi_layer or {}
        self.output_size = roi_layer.get("output_size", 7)
        self.sampling_ratio = max(int(roi_layer.get("sampling_ratio", 2)), 1)
        self.out_channels = out_channels
        self.featmap_strides = tuple(featmap_strides)
        self.finest_scale = finest_scale

    @property
    def num_inputs(self):
        return len(self.featmap_strides)

    def __call__(self, feats, rois):
        feats = feats[:self.num_inputs]
        w = rois[:, 3] - rois[:, 1]
        h = rois[:, 4] - rois[:, 2]
        lvls = map_roi_levels(jnp.sqrt(jnp.maximum(w * h, 1e-6)),
                              self.num_inputs, self.finest_scale)
        out = 0.0
        for i, stride in enumerate(self.featmap_strides):
            pooled = roi_align(feats[i], rois, self.output_size,
                               1.0 / stride, self.sampling_ratio)
            sel = (lvls == i).astype(pooled.dtype)[:, None, None, None]
            out = out + pooled * sel
        return out


@ROI_EXTRACTORS.register_module()
class RboxSingleRoIExtractor(OrientedSingleRoIExtractor):
    """Legacy rotated extractor (reference ``rbox_single_level.py``)."""
