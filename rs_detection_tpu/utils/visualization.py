"""Detection visualization: draw oriented boxes on images.

Capability parity with the reference visualization utils
(``python/jdet/utils/visualization.py:34-59`` and ``draw.py``):
``visualize_results`` (per-image poly/score/label overlays),
``visualize_dota`` (DOTA det-txt reader + drawing), ``draw_bboxes``.
Uses PIL instead of matplotlib/cv2 windows — headless friendly.
"""

from __future__ import annotations

import os
from typing import List, Optional, Sequence, Tuple

import numpy as np
from PIL import Image, ImageDraw

from ..config.constant import DOTA_COLORS


def _color(label: int) -> Tuple[int, int, int]:
    c = DOTA_COLORS[int(label) % len(DOTA_COLORS)] * 255
    return tuple(int(v) for v in c)


def draw_bboxes(image: Image.Image, polys: np.ndarray,
                scores: Optional[np.ndarray] = None,
                labels: Optional[np.ndarray] = None,
                class_names: Optional[Sequence[str]] = None,
                score_thr: float = 0.3, width: int = 2) -> Image.Image:
    """Draw oriented quads (with optional class/score text)."""
    img = image.copy()
    d = ImageDraw.Draw(img)
    polys = np.asarray(polys).reshape(-1, 8)
    for i, poly in enumerate(polys):
        if scores is not None and scores[i] < score_thr:
            continue
        label = int(labels[i]) if labels is not None else 0
        color = _color(label)
        pts = [(poly[j], poly[j + 1]) for j in range(0, 8, 2)]
        d.polygon(pts, outline=color, width=width)
        if scores is not None:
            name = (class_names[label - 1]
                    if class_names and 0 < label <= len(class_names)
                    else str(label))
            d.text((poly[0], poly[1] - 10), f"{name} {scores[i]:.2f}",
                   fill=color)
    return img


def visualize_results(results: List, classes, img_files: List[str],
                      save_dir: str, score_thr: float = 0.3):
    """results: per image (polys, scores, labels)
    (reference ``visualization.py:55-59``)."""
    os.makedirs(save_dir, exist_ok=True)
    for (polys, scores, labels), path in zip(results, img_files):
        img = Image.open(path).convert("RGB")
        out = draw_bboxes(img, polys, scores, labels, classes, score_thr)
        out.save(os.path.join(save_dir, os.path.basename(path)))


def visualize_dota(det_dir: str, images_dir: str, save_dir: str,
                   score_thr: float = 0.3):
    """Read per-class DOTA det txts and draw per image
    (reference ``visualization.py:34``)."""
    per_image = {}
    for f in sorted(os.listdir(det_dir)):
        if not f.endswith(".txt"):
            continue
        cls = f[:-4]
        with open(os.path.join(det_dir, f)) as fh:
            for line in fh:
                parts = line.strip().split(" ")
                if len(parts) < 10:
                    continue
                img = parts[0]
                score = float(parts[1])
                poly = [float(v) for v in parts[2:10]]
                per_image.setdefault(img, []).append((cls, score, poly))
    os.makedirs(save_dir, exist_ok=True)
    classes = sorted({c for dets in per_image.values()
                      for c, _, _ in dets})
    cls_idx = {c: i + 1 for i, c in enumerate(classes)}
    for img_name, dets in per_image.items():
        for ext in (".png", ".jpg", ".tif"):
            path = os.path.join(images_dir, img_name + ext)
            if os.path.exists(path):
                break
        else:
            continue
        img = Image.open(path).convert("RGB")
        polys = np.asarray([d[2] for d in dets])
        scores = np.asarray([d[1] for d in dets])
        labels = np.asarray([cls_idx[d[0]] for d in dets])
        out = draw_bboxes(img, polys, scores, labels, classes, score_thr)
        out.save(os.path.join(save_dir, img_name + ".png"))
