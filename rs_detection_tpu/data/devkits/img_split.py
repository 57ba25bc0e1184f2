"""Large-image tiler: sliding-window splitter for DOTA/FAIR scenes.

Capability parity with the reference multi-process splitter
(``python/jdet/data/devkits/ImgSplit_multi_process.py``): per-scale
cubic resize, sliding window ``slide = subsize - gap`` with edge
snapping, polygon-vs-tile intersection with ``half_iou`` keep threshold
(default 0.7) and ``difficult=2`` relabeling of badly-cut instances,
5-point -> 4-point polygon repair, best point-order matching, tile
naming ``name__rate__left___up``, padded tiles, multiprocessing pool.

Shapely-free: convex clipping uses the same Sutherland–Hodgman core as
the polygon NMS (``ops/nms_poly.py``), with consecutive-duplicate
removal to mirror shapely's cleaned exterior rings.
"""

from __future__ import annotations

import math
import os
from functools import partial
from multiprocessing import Pool
from typing import Dict, List, Optional

import cv2
import numpy as np

from ...ops.nms_poly import clip_polygons, polygon_area


def parse_dota_poly(label_file: str) -> List[Dict]:
    """Parse a DOTA labelTxt: rows 'x1 y1 ... x4 y4 name difficult'."""
    objects = []
    if not os.path.exists(label_file):
        return objects
    with open(label_file, "r", errors="ignore") as f:
        for line in f:
            parts = line.strip().split(" ")
            if len(parts) < 9:
                continue  # header lines (imagesource / gsd)
            try:
                poly = [float(p) for p in parts[:8]]
            except ValueError:
                continue
            name = parts[8]
            difficult = int(parts[9]) if len(parts) > 9 else 0
            objects.append(dict(poly=poly, name=name, difficult=difficult))
    return objects


def choose_best_pointorder_fit_another(poly1, poly2):
    """Pick the cyclic rotation of poly1 closest to poly2
    (reference ``:20-37``)."""
    p1 = np.asarray(poly1, np.float64)
    p2 = np.asarray(poly2, np.float64)
    best, best_d = p1, np.inf
    for k in range(4):
        cand = np.roll(p1.reshape(4, 2), -k, axis=0).reshape(8)
        d = np.sum((cand - p2) ** 2)
        if d < best_d:
            best, best_d = cand, d
    return best


def get_poly4_from_poly5(poly):
    """Merge the shortest edge's endpoints (reference ``:153-173``)."""
    pts = np.asarray(poly, np.float64).reshape(5, 2)
    dists = [np.hypot(*(pts[i] - pts[(i + 1) % 5])) for i in range(5)]
    pos = int(np.argmin(dists))
    out = []
    count = 0
    while count < 5:
        if count == pos:
            out.append((pts[count] + pts[(count + 1) % 5]) / 2.0)
            count += 1
        elif count == (pos + 1) % 5:
            count += 1
        else:
            out.append(pts[count])
            count += 1
    return np.asarray(out).reshape(-1)


def _clean_ring(verts: np.ndarray, tol: float = 1e-8) -> np.ndarray:
    """Drop consecutive duplicates (mirrors shapely ring cleanup)."""
    if len(verts) == 0:
        return verts
    keep = [verts[0]]
    for v in verts[1:]:
        if np.hypot(*(v - keep[-1])) > tol:
            keep.append(v)
    if len(keep) > 1 and np.hypot(*(keep[0] - keep[-1])) <= tol:
        keep.pop()
    return np.asarray(keep)


def _orient_ccw(verts: np.ndarray) -> np.ndarray:
    """Force positive (counter-clockwise) shoelace orientation
    (shapely ``orient(sign=1)``)."""
    if len(verts) < 3:
        return verts
    s = 0.0
    for i in range(len(verts)):
        a, b = verts[i], verts[(i + 1) % len(verts)]
        s += a[0] * b[1] - b[0] * a[1]
    return verts if s >= 0 else verts[::-1]


class splitbase:
    def __init__(self, basepath, outpath, code="utf-8", gap=512,
                 subsize=1024, thresh=0.7, choosebestpoint=True,
                 ext=".png", padding=True, num_process=8, yx_style=False):
        self.basepath = basepath
        self.outpath = outpath
        self.gap = gap
        self.subsize = subsize
        self.slide = subsize - gap
        self.thresh = thresh
        self.choosebestpoint = choosebestpoint
        self.ext = ext
        self.padding = padding
        self.num_process = num_process
        self.yx_style = yx_style
        self.imagepath = os.path.join(basepath, "images")
        self.labelpath = os.path.join(basepath, "labelTxt")
        self.process_label = os.path.exists(self.labelpath)
        self.outimagepath = os.path.join(outpath, "images")
        self.outlabelpath = os.path.join(outpath, "labelTxt")
        os.makedirs(self.outimagepath, exist_ok=True)
        if self.process_label:
            os.makedirs(self.outlabelpath, exist_ok=True)

    # ------------------------------------------------------------------

    def _clip_poly_to_tile(self, poly, left, up, right, down):
        """Returns (half_iou, clipped_poly_or_None)."""
        p = np.asarray(poly, np.float64).reshape(4, 2)
        area = polygon_area(p[None], np.array([4]))[0]
        if area <= 0:
            return 0.0, None
        tile = np.array([[left, up], [right, up], [right, down],
                         [left, down]], np.float64)
        verts, counts = clip_polygons(p[None], np.array([4]), tile)
        inter_area = polygon_area(verts, counts)[0]
        half_iou = inter_area / area
        if counts[0] < 3:
            return half_iou, None
        ring = _clean_ring(verts[0, :counts[0]])
        return half_iou, ring

    def savepatches(self, resizeimg, objects, subimgname, left, up,
                    right, down):
        outdir = os.path.join(self.outlabelpath, subimgname + ".txt")
        lines = []
        for obj in objects:
            half_iou, ring = self._clip_poly_to_tile(
                obj["poly"], left, up, right, down)
            if self.yx_style and half_iou > 0.5:
                sub = self._to_sub(obj["poly"], left, up)
                lines.append(self._fmt(sub, obj["name"], 0))
                continue
            if half_iou >= 1.0 - 1e-9:
                sub = self._to_sub(obj["poly"], left, up)
                lines.append(self._fmt(sub, obj["name"],
                                       obj["difficult"]))
            elif half_iou > 0 and ring is not None:
                ring = _orient_ccw(ring)
                if len(ring) < 4:
                    continue
                flat = ring.reshape(-1)
                if len(ring) == 5:
                    flat = get_poly4_from_poly5(flat)
                elif len(ring) > 5:
                    continue  # reference drops >5-gon cuts
                if self.choosebestpoint:
                    flat = choose_best_pointorder_fit_another(
                        flat, obj["poly"])
                sub = self._to_sub(flat, left, up)
                sub = np.clip(sub, 1, self.subsize)
                diff = (obj["difficult"] if half_iou > self.thresh
                        else 2)  # badly-cut -> difficult=2
                lines.append(self._fmt(sub, obj["name"], diff))
        with open(outdir, "w") as f:
            f.writelines(lines)
        self.saveimagepatches(resizeimg, subimgname, left, up)

    @staticmethod
    def _to_sub(poly, left, up):
        p = np.asarray(poly, np.float64).copy()
        p[0::2] = np.floor(p[0::2] - left)
        p[1::2] = np.floor(p[1::2] - up)
        return p

    @staticmethod
    def _fmt(poly, name, difficult):
        return " ".join(str(float(v)) for v in poly) \
            + f" {name} {difficult}\n"

    def saveimagepatches(self, img, subimgname, left, up):
        sub = img[up:up + self.subsize, left:left + self.subsize]
        out = os.path.join(self.outimagepath, subimgname + self.ext)
        if self.padding:
            h, w = sub.shape[:2]
            canvas = np.zeros((self.subsize, self.subsize, 3),
                              sub.dtype)
            canvas[:h, :w] = sub
            cv2.imwrite(out, canvas)
        else:
            cv2.imwrite(out, sub)

    def SplitSingle(self, name, rate, extent):
        img = cv2.imread(os.path.join(self.imagepath, name + extent))
        if img is None:
            return
        objects = []
        if self.process_label:
            objects = parse_dota_poly(
                os.path.join(self.labelpath, name + ".txt"))
            for obj in objects:
                obj["poly"] = [rate * x for x in obj["poly"]]
        if rate != 1:
            img = cv2.resize(img, None, fx=rate, fy=rate,
                             interpolation=cv2.INTER_CUBIC)
        outbase = f"{name}__{rate}__"
        height, width = img.shape[:2]
        left = 0
        while left < width:
            if left + self.subsize >= width:
                left = max(width - self.subsize, 0)
            up = 0
            while up < height:
                if up + self.subsize >= height:
                    up = max(height - self.subsize, 0)
                right = min(left + self.subsize, width - 1)
                down = min(up + self.subsize, height - 1)
                subimgname = f"{outbase}{left}___{up}"
                if self.process_label:
                    self.savepatches(img, objects, subimgname, left, up,
                                     right, down)
                else:
                    self.saveimagepatches(img, subimgname, left, up)
                if up + self.subsize >= height:
                    break
                up += self.slide
            if left + self.subsize >= width:
                break
            left += self.slide

    def splitdata(self, rate):
        names = sorted(
            os.path.splitext(f)[0] for f in os.listdir(self.imagepath)
            if not f.startswith("Thumbs"))
        if self.num_process <= 1:
            for name in names:
                self.SplitSingle(name, rate, self.ext)
        else:
            with Pool(self.num_process) as pool:
                pool.map(partial(_split_worker, split_base=self,
                                 rate=rate, extent=self.ext), names)


def _split_worker(name, split_base, rate, extent):
    split_base.SplitSingle(name, rate, extent)


def process(src_path, target_path, gap=200, subsize=1024, rates=(1.0,),
            num_process=8, **kw):
    """Pipeline entry (reference ``:320-330``): output dir is suffixed
    ``_<subsize>_<gap>_<rates>``."""
    target_path = (f"{target_path}_{subsize}_{gap}_"
                   + "-".join(str(r) for r in rates))
    os.makedirs(target_path, exist_ok=True)
    split = splitbase(src_path, target_path, gap=gap, subsize=subsize,
                      num_process=num_process, **kw)
    for rate in rates:
        split.splitdata(rate)
    return target_path
