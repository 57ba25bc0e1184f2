"""Anchor generators (static numpy precompute; constants under jit).

Capability parity with the reference generators
(``python/jdet/models/boxes/anchor_generator.py``):
``AnchorGeneratorRotatedS2ANet`` (:8-91, legacy -1 center),
``AnchorGenerator`` (mmdet v2 hbb, :94-493),
``AnchorGeneratorRotated`` (:495-649),
``AnchorGeneratorYangXue`` (:651, w/h swap), ``SSDAnchorGenerator``
(:695).

Feature-map sizes are static under jit, so grids are plain numpy arrays
computed once and closed over as constants — zero per-step cost on TPU.
"""

from __future__ import annotations

import math
from typing import List, Optional, Sequence, Tuple

import numpy as np

from ...utils.registry import BOXES


def _meshgrid(x: np.ndarray, y: np.ndarray):
    """Row-major: x varies fastest (reference ``:49-56``)."""
    xx = np.tile(x, len(y))
    yy = np.repeat(y, len(x))
    return xx, yy


@BOXES.register_module()
class AnchorGeneratorRotatedS2ANet:
    """Rotated anchors with the legacy 0.5*(size-1) center
    (reference ``anchor_generator.py:8-91``)."""

    def __init__(self, base_size, scales, ratios, angles=(0,),
                 scale_major=True, ctr=None, mode="S2ANet"):
        self.base_size = base_size
        self.scales = np.asarray(scales, np.float32)
        self.ratios = np.asarray(ratios, np.float32)
        self.angles = np.asarray(angles, np.float32)
        self.ctr = ctr
        self.mode = mode
        self.base_anchors = self.gen_base_anchors()
        self._cache = {}

    @property
    def num_base_anchors(self) -> int:
        return self.base_anchors.shape[0]

    def gen_base_anchors(self) -> np.ndarray:
        w = h = float(self.base_size)
        if self.ctr is None:
            x_ctr = 0.5 * (w - 1)
            y_ctr = 0.5 * (h - 1)
        else:
            x_ctr, y_ctr = self.ctr
        h_ratios = np.sqrt(self.ratios)
        w_ratios = 1.0 / h_ratios
        # scale-major ordering: (ratio, scale, angle)
        ws = (w * w_ratios[:, None, None] * self.scales[None, :, None]
              * np.ones_like(self.angles)[None, None, :]).reshape(-1)
        hs = (h * h_ratios[:, None, None] * self.scales[None, :, None]
              * np.ones_like(self.angles)[None, None, :]).reshape(-1)
        angles = np.tile(self.angles, len(self.scales) * len(self.ratios))
        if self.mode == "YangXue":
            # w/h swap convention (AnchorGeneratorYangXue :651)
            ws, hs = hs, ws
        n = ws.shape[0]
        return np.stack([np.full(n, x_ctr, np.float32),
                         np.full(n, y_ctr, np.float32),
                         ws, hs, angles], axis=-1).astype(np.float32)

    def grid_anchors(self, featmap_size: Tuple[int, int],
                     stride: int = 16) -> np.ndarray:
        key = (featmap_size, stride)
        if key not in self._cache:
            fh, fw = featmap_size
            sx = np.arange(fw, dtype=np.float32) * stride
            sy = np.arange(fh, dtype=np.float32) * stride
            xx, yy = _meshgrid(sx, sy)
            shifts = np.stack([xx, yy, np.zeros_like(xx),
                               np.zeros_like(xx), np.zeros_like(xx)], -1)
            all_anchors = (self.base_anchors[None, :, :]
                           + shifts[:, None, :]).reshape(-1, 5)
            self._cache[key] = all_anchors.astype(np.float32)
        return self._cache[key]

    def valid_flags(self, featmap_size, valid_size) -> np.ndarray:
        fh, fw = featmap_size
        vh, vw = valid_size
        vx = np.zeros(fw, bool)
        vy = np.zeros(fh, bool)
        vx[:vw] = True
        vy[:vh] = True
        xx, yy = _meshgrid(vx, vy)
        valid = xx & yy
        return np.repeat(valid, self.num_base_anchors)


@BOXES.register_module()
class AnchorGeneratorYangXue(AnchorGeneratorRotatedS2ANet):
    """w/h-swapped convention (reference ``:651``)."""

    def __init__(self, *a, **kw):
        kw["mode"] = "YangXue"
        super().__init__(*a, **kw)


@BOXES.register_module()
class AnchorGeneratorRotated(AnchorGeneratorRotatedS2ANet):
    """Generic rotated generator (reference ``:495-649``); same math as
    the S2ANet variant with configurable center."""


@BOXES.register_module()
class AnchorGenerator:
    """mmdet-v2 horizontal anchor generator
    (reference ``anchor_generator.py:94-493``)."""

    def __init__(self,
                 strides: Sequence[int],
                 ratios: Sequence[float],
                 scales: Optional[Sequence[float]] = None,
                 base_sizes: Optional[Sequence[int]] = None,
                 scale_major: bool = True,
                 octave_base_scale: Optional[int] = None,
                 scales_per_octave: Optional[int] = None,
                 centers=None,
                 center_offset: float = 0.0,
                 mode: str = 'R'):
        self.strides = [s if isinstance(s, (tuple, list)) else (s, s)
                        for s in strides]
        self.base_sizes = ([min(s) for s in self.strides]
                           if base_sizes is None else list(base_sizes))
        if scales is not None:
            self.scales = np.asarray(scales, np.float32)
        else:
            assert octave_base_scale is not None
            octave_scales = np.array(
                [2 ** (i / scales_per_octave)
                 for i in range(scales_per_octave)])
            self.scales = (octave_scales * octave_base_scale).astype(
                np.float32)
        self.ratios = np.asarray(ratios, np.float32)
        self.scale_major = scale_major
        self.centers = centers
        self.center_offset = center_offset
        self.base_anchors = self.gen_base_anchors()
        self._cache = {}

    @property
    def num_levels(self) -> int:
        return len(self.strides)

    @property
    def num_base_anchors(self) -> List[int]:
        return [ba.shape[0] for ba in self.base_anchors]

    def gen_base_anchors(self) -> List[np.ndarray]:
        out = []
        for i, base_size in enumerate(self.base_sizes):
            center = self.centers[i] if self.centers is not None else None
            out.append(self._single_level(base_size, center))
        return out

    def _single_level(self, base_size, center) -> np.ndarray:
        w = h = float(base_size)
        if center is None:
            x_c = self.center_offset * w
            y_c = self.center_offset * h
        else:
            x_c, y_c = center
        h_ratios = np.sqrt(self.ratios)
        w_ratios = 1.0 / h_ratios
        if self.scale_major:
            ws = (w * w_ratios[:, None] * self.scales[None, :]).reshape(-1)
            hs = (h * h_ratios[:, None] * self.scales[None, :]).reshape(-1)
        else:
            ws = (w * self.scales[:, None] * w_ratios[None, :]).reshape(-1)
            hs = (h * self.scales[:, None] * h_ratios[None, :]).reshape(-1)
        return np.stack([x_c - 0.5 * ws, y_c - 0.5 * hs,
                         x_c + 0.5 * ws, y_c + 0.5 * hs], -1) \
            .astype(np.float32)

    def grid_anchors(self, featmap_sizes) -> List[np.ndarray]:
        """Per-level [A_l, 4] anchors for given feature sizes."""
        return [self.single_level_grid_anchors(featmap_sizes[i], i)
                for i in range(self.num_levels)]

    def single_level_grid_anchors(self, featmap_size, level: int):
        key = (tuple(featmap_size), level)
        if key not in self._cache:
            fh, fw = featmap_size
            sw, sh = self.strides[level]
            sx = np.arange(fw, dtype=np.float32) * sw
            sy = np.arange(fh, dtype=np.float32) * sh
            xx, yy = _meshgrid(sx, sy)
            shifts = np.stack([xx, yy, xx, yy], -1)
            anchors = (self.base_anchors[level][None, :, :]
                       + shifts[:, None, :]).reshape(-1, 4)
            self._cache[key] = anchors.astype(np.float32)
        return self._cache[key]

    def valid_flags(self, featmap_sizes, pad_shape) -> List[np.ndarray]:
        out = []
        for i in range(self.num_levels):
            fh, fw = featmap_sizes[i]
            sw, sh = self.strides[i]
            vh = min(int(math.ceil(pad_shape[0] / sh)), fh)
            vw = min(int(math.ceil(pad_shape[1] / sw)), fw)
            vx = np.zeros(fw, bool)
            vy = np.zeros(fh, bool)
            vx[:vw] = True
            vy[:vh] = True
            xx, yy = _meshgrid(vx, vy)
            valid = xx & yy
            out.append(np.repeat(valid, self.num_base_anchors[i]))
        return out


@BOXES.register_module()
class SSDAnchorGenerator(AnchorGenerator):
    """SSD multibox anchors (reference ``:695``): per-level min/max
    sizes derived from ``basesize_ratio_range``."""

    def __init__(self, strides, ratios, basesize_ratio_range,
                 input_size=300, scale_major=False):
        self.strides = [(s, s) for s in strides]
        self.input_size = input_size
        self.centers = [((s[0] - 1) / 2.0, (s[1] - 1) / 2.0)
                        for s in self.strides]
        min_ratio, max_ratio = basesize_ratio_range
        min_ratio, max_ratio = int(min_ratio * 100), int(max_ratio * 100)
        step = int(math.floor(max_ratio - min_ratio) / (len(strides) - 2))
        min_sizes, max_sizes = [], []
        for ratio in range(int(min_ratio), int(max_ratio) + 1, step):
            min_sizes.append(int(input_size * ratio / 100))
            max_sizes.append(int(input_size * (ratio + step) / 100))
        if min_ratio == 20:
            min_sizes.insert(0, int(input_size * 10 / 100))
            max_sizes.insert(0, int(input_size * 20 / 100))
        else:
            min_sizes.insert(0, int(input_size * 7 / 100))
            max_sizes.insert(0, int(input_size * 15 / 100))
        anchor_ratios = []
        anchor_scales = []
        for k in range(len(self.strides)):
            scales = [1.0, np.sqrt(max_sizes[k] / min_sizes[k])]
            anchor_ratio = [1.0]
            for r in ratios[k]:
                anchor_ratio += [1 / r, r]
            anchor_ratios.append(np.array(anchor_ratio, np.float32))
            anchor_scales.append(np.array(scales, np.float32))
        self.base_sizes = min_sizes
        self.scales_per_level = anchor_scales
        self.ratios_per_level = anchor_ratios
        self.scale_major = scale_major
        self.center_offset = 0.0
        self.base_anchors = self.gen_base_anchors()
        self._cache = {}

    def gen_base_anchors(self):
        out = []
        for i, base_size in enumerate(self.base_sizes):
            self.scales = self.scales_per_level[i]
            self.ratios = self.ratios_per_level[i]
            anchors = self._single_level(base_size, self.centers[i])
            # SSD keeps scale-1 anchors for every ratio plus the
            # sqrt-scale square anchor
            keep = list(range(len(self.ratios_per_level[i]) * 2))
            idx = [0, len(self.ratios_per_level[i])] + \
                list(range(2, len(keep)))[:len(keep) - 2]
            out.append(anchors[np.unique(idx)])
        return out
