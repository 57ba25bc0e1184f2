"""YOLO dataset with mosaic / HSV / flip / perspective augmentation.

Capability parity with the reference YOLO data path
(``python/jdet/data/yolo.py:40,148`` — ``YoloDataset`` /
``LoadImagesAndLabels``): 4- and 9-image mosaic, the full
``YoloRandomPerspective`` warp (center/perspective/rotation/scale/
shear/translation matrix composition + ``box_candidates`` filtering,
reference ``transforms.py:826-920``), mixup (beta(8, 8) blending,
``yolo.py:349-352``), cutout (``yolo.py:787``), letterbox with
stride-aligned auto padding (``yolo.py:754``), HSV jitter and flips;
boxes are plain hbbs.
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


def box_candidates(box1, box2, wh_thr=2, ar_thr=20, area_thr=0.1):
    """Keep warped boxes that stay box-like (reference
    ``transforms.py`` ``box_candidates``): box1/box2 are [4, n]
    before/after the transform."""
    w1, h1 = box1[2] - box1[0], box1[3] - box1[1]
    w2, h2 = box2[2] - box2[0], box2[3] - box2[1]
    ar = np.maximum(w2 / (h2 + 1e-16), h2 / (w2 + 1e-16))
    return ((w2 > wh_thr) & (h2 > wh_thr)
            & (w2 * h2 / (w1 * h1 + 1e-16) > area_thr) & (ar < ar_thr))


def yolo_random_perspective(img, boxes, labels, degrees=10,
                            translate=0.1, scale=0.1, shear=10,
                            perspective=0.0, border=(0, 0)):
    """Full YOLO random perspective/affine warp (reference
    ``transforms.py:826-920`` ``YoloRandomPerspective``): composes
    center -> perspective -> rotation+scale -> shear -> translation,
    warps the image, maps the 4 corners of every hbb through the
    matrix, takes the axis-aligned hull, clips, and keeps
    ``box_candidates``."""
    import math

    height = img.shape[0] + border[0] * 2
    width = img.shape[1] + border[1] * 2

    c_m = np.eye(3)
    c_m[0, 2] = -img.shape[1] / 2
    c_m[1, 2] = -img.shape[0] / 2
    p_m = np.eye(3)
    p_m[2, 0] = random.uniform(-perspective, perspective)
    p_m[2, 1] = random.uniform(-perspective, perspective)
    r_m = np.eye(3)
    a = random.uniform(-degrees, degrees)
    s = random.uniform(1 - scale, 1 + scale)
    r_m[:2] = cv2.getRotationMatrix2D(angle=a, center=(0, 0), scale=s)
    s_m = np.eye(3)
    s_m[0, 1] = math.tan(random.uniform(-shear, shear) * math.pi / 180)
    s_m[1, 0] = math.tan(random.uniform(-shear, shear) * math.pi / 180)
    t_m = np.eye(3)
    t_m[0, 2] = random.uniform(0.5 - translate, 0.5 + translate) * width
    t_m[1, 2] = random.uniform(0.5 - translate, 0.5 + translate) * height

    m = t_m @ s_m @ r_m @ p_m @ c_m
    if (border[0] != 0) or (border[1] != 0) or (m != np.eye(3)).any():
        if perspective:
            img = cv2.warpPerspective(img, m, dsize=(width, height),
                                      borderValue=(114, 114, 114))
        else:
            img = cv2.warpAffine(img, m[:2], dsize=(width, height),
                                 borderValue=(114, 114, 114))

    n = len(boxes)
    if n:
        xy = np.ones((n * 4, 3))
        xy[:, :2] = boxes[:, [0, 1, 2, 3, 0, 3, 2, 1]].reshape(n * 4, 2)
        xy = xy @ m.T
        xy = (xy[:, :2] / xy[:, 2:3] if perspective
              else xy[:, :2]).reshape(n, 8)
        x = xy[:, [0, 2, 4, 6]]
        y = xy[:, [1, 3, 5, 7]]
        new = np.concatenate((x.min(1), y.min(1), x.max(1),
                              y.max(1))).reshape(4, n).T
        new[:, [0, 2]] = new[:, [0, 2]].clip(0, width)
        new[:, [1, 3]] = new[:, [1, 3]].clip(0, height)
        keep = box_candidates(box1=boxes.T * s, box2=new.T)
        boxes = new[keep].astype(np.float32)
        labels = labels[keep]
    return img, boxes, labels


def letterbox(img, new_shape=640, color=(114, 114, 114), auto=True,
              scale_fill=False, scaleup=True, stride=32):
    """Resize + pad to ``new_shape`` keeping aspect ratio (reference
    ``yolo.py:754``). Returns (img, (rw, rh), (dw, dh))."""
    shape = img.shape[:2]
    if isinstance(new_shape, int):
        new_shape = (new_shape, new_shape)
    r = min(new_shape[0] / shape[0], new_shape[1] / shape[1])
    if not scaleup:
        r = min(r, 1.0)
    ratio = (r, r)
    new_unpad = (int(round(shape[1] * r)), int(round(shape[0] * r)))
    dw = new_shape[1] - new_unpad[0]
    dh = new_shape[0] - new_unpad[1]
    if auto:                      # minimum stride-aligned padding
        dw, dh = dw % stride, dh % stride
    elif scale_fill:              # stretch
        dw, dh = 0, 0
        new_unpad = (new_shape[1], new_shape[0])
        ratio = (new_shape[1] / shape[1], new_shape[0] / shape[0])
    dw /= 2
    dh /= 2
    if shape[::-1] != new_unpad:
        img = cv2.resize(img, new_unpad, interpolation=cv2.INTER_LINEAR)
    top, bottom = int(round(dh - 0.1)), int(round(dh + 0.1))
    left, right = int(round(dw - 0.1)), int(round(dw + 0.1))
    img = cv2.copyMakeBorder(img, top, bottom, left, right,
                             cv2.BORDER_CONSTANT, value=color)
    return img, ratio, (dw, dh)


def cutout(img, boxes):
    """Random occlusion cutouts; drops boxes >60% occluded (reference
    ``yolo.py:787-830``). Mutates ``img``; returns the keep mask."""
    h, w = img.shape[:2]

    def bbox_ioa(box1, box2):
        box2 = box2.T
        ix = (np.minimum(box1[2], box2[2])
              - np.maximum(box1[0], box2[0])).clip(0)
        iy = (np.minimum(box1[3], box2[3])
              - np.maximum(box1[1], box2[1])).clip(0)
        area = ((box2[2] - box2[0]) * (box2[3] - box2[1]) + 1e-16)
        return ix * iy / area

    keep = np.ones((len(boxes),), bool)
    scales = [0.5] * 1 + [0.25] * 2 + [0.125] * 4 + [0.0625] * 8 \
        + [0.03125] * 16
    for sc in scales:
        mask_h = random.randint(1, int(h * sc))
        mask_w = random.randint(1, int(w * sc))
        xmin = max(0, random.randint(0, w) - mask_w // 2)
        ymin = max(0, random.randint(0, h) - mask_h // 2)
        xmax = min(w, xmin + mask_w)
        ymax = min(h, ymin + mask_h)
        img[ymin:ymax, xmin:xmax] = [random.randint(64, 191)
                                     for _ in range(3)]
        if len(boxes) and sc > 0.03:
            ioa = bbox_ioa(np.asarray([xmin, ymin, xmax, ymax],
                                      np.float32), boxes)
            keep &= ioa < 0.60
    return keep


@DATASETS.register_module()
class YoloDataset:
    """Reads the same labels.pkl format as CustomDataset but with hbb
    annotations; emits mosaic-augmented fixed-size square images."""

    def __init__(self, images_dir=None, annotations_file=None,
                 dataset_dir=None, img_size=640, batch_size=8,
                 num_workers=0, shuffle=True, mosaic=True,
                 hsv=True, flip=True, max_gt=512,
                 random_perspective=None, mixup_prob=0.0,
                 mosaic9_prob=0.0, cutout_prob=0.0, stride=32, **kw):
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
        # reference cfg shape: dict(degrees=.., translate=.., scale=..,
        # shear=.., perspective=..) or None (no warp)
        if random_perspective is not None:
            random_perspective = {k: v for k, v in
                                  dict(random_perspective).items()
                                  if k != "type"}
        self.random_perspective = random_perspective
        self.mixup_prob = mixup_prob
        self.mosaic9_prob = mosaic9_prob
        self.cutout_prob = cutout_prob
        self.stride = stride
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
        return self._finish_mosaic(canvas, boxes, labels)

    def _finish_mosaic(self, canvas, boxes, labels):
        """Reduce an oversized mosaic canvas to s x s: the reference
        pipes it through ``random_perspective`` with a negative border
        (``yolo.py:655-665``); without a perspective cfg we center-crop
        (the warp's degenerate identity case)."""
        s = self.img_size
        if self.random_perspective is not None:
            np.clip(boxes[:, 0::2], 0, canvas.shape[1], out=boxes[:, 0::2])
            np.clip(boxes[:, 1::2], 0, canvas.shape[0], out=boxes[:, 1::2])
            border = ((s - canvas.shape[0]) // 2,
                      (s - canvas.shape[1]) // 2)
            return yolo_random_perspective(
                canvas, boxes, labels, border=border,
                **self.random_perspective)
        off = (canvas.shape[0] - s) // 2
        canvas = canvas[off:off + s, off:off + s]
        boxes[:, 0::2] = np.clip(boxes[:, 0::2] - off, 0, s - 1)
        boxes[:, 1::2] = np.clip(boxes[:, 1::2] - off, 0, s - 1)
        keep = ((boxes[:, 2] - boxes[:, 0] > 2)
                & (boxes[:, 3] - boxes[:, 1] > 2))
        return canvas, boxes[keep], labels[keep]

    def _mosaic9(self, idx):
        """9-image mosaic (reference ``yolo.py:669-736``
        ``load_mosaic9``): tiles chained clockwise around a center
        image on a 3s x 3s canvas (each placement keyed off the
        previous tile's dims), randomly cropped to 2s x 2s, then
        reduced like mosaic4."""
        s = self.img_size
        idxs = [idx] + [random.randint(0, self.total_len - 1)
                        for _ in range(8)]
        canvas = np.full((3 * s, 3 * s, 3), 114, np.uint8)
        all_boxes, all_labels = [], []
        hp = wp = h0 = w0 = -1
        for i, ix in enumerate(idxs):
            img, boxes, labels = self._load(ix)
            ih, iw = img.shape[:2]
            r = s / max(ih, iw)
            img = cv2.resize(img, (int(iw * r), int(ih * r)))
            h, w = img.shape[:2]
            if i == 0:        # center
                h0, w0 = h, w
                c = (s, s, s + w, s + h)
            elif i == 1:      # top
                c = (s, s - h, s + w, s)
            elif i == 2:      # top right
                c = (s + wp, s - h, s + wp + w, s)
            elif i == 3:      # right
                c = (s + w0, s, s + w0 + w, s + h)
            elif i == 4:      # bottom right
                c = (s + w0, s + hp, s + w0 + w, s + hp + h)
            elif i == 5:      # bottom
                c = (s + w0 - w, s + hp, s + w0, s + hp + h)
            elif i == 6:      # bottom left
                c = (s + w0 - wp - w, s + hp, s + w0 - wp, s + hp + h)
            elif i == 7:      # left
                c = (s - w, s + h0 - h, s, s + h0)
            else:             # top left
                c = (s - w, s + h0 - hp - h, s, s + h0 - hp)
            padx, pady = c[0], c[1]
            x1, y1, x2, y2 = (max(v, 0) for v in c)
            x2, y2 = min(x2, 3 * s), min(y2, 3 * s)
            if x2 > x1 and y2 > y1:
                canvas[y1:y2, x1:x2] = img[y1 - pady:y2 - pady,
                                           x1 - padx:x2 - padx]
            hp, wp = h, w
            if boxes.size:
                b = boxes * r
                b[:, 0::2] += padx
                b[:, 1::2] += pady
                all_boxes.append(b)
                all_labels.append(labels)
        # random 2s x 2s crop (reference: offsets drawn from the
        # mosaic border range)
        yc = int(random.uniform(0, s))
        xc = int(random.uniform(0, s))
        canvas = canvas[yc:yc + 2 * s, xc:xc + 2 * s]
        boxes = (np.concatenate(all_boxes)
                 if all_boxes else np.zeros((0, 4), np.float32))
        labels = (np.concatenate(all_labels)
                  if all_labels else np.zeros((0,), np.int32))
        if boxes.size:
            boxes[:, 0::2] = np.clip(boxes[:, 0::2] - xc, 0, 2 * s)
            boxes[:, 1::2] = np.clip(boxes[:, 1::2] - yc, 0, 2 * s)
            ok = ((boxes[:, 2] - boxes[:, 0] > 2)
                  & (boxes[:, 3] - boxes[:, 1] > 2))
            boxes, labels = boxes[ok], labels[ok]
        return self._finish_mosaic(canvas, boxes, labels)

    def _mosaic_sample(self, idx):
        if self.mosaic9_prob > 0 and random.random() < self.mosaic9_prob:
            return self._mosaic9(idx)
        return self._mosaic4(idx)

    def __getitem__(self, idx):
        if self.mosaic:
            img, boxes, labels = self._mosaic_sample(idx)
            if self.mixup_prob > 0 and random.random() < self.mixup_prob:
                # beta(8, 8) image blending (reference yolo.py:349-352)
                img2, boxes2, labels2 = self._mosaic_sample(
                    random.randint(0, self.total_len - 1))
                r = np.random.beta(8.0, 8.0)
                img = (img.astype(np.float32) * r
                       + img2.astype(np.float32) * (1 - r)) \
                    .astype(np.uint8)
                boxes = np.concatenate([boxes, boxes2], 0)
                labels = np.concatenate([labels, labels2], 0)
        else:
            img, boxes, labels = self._load(idx)
            img, ratio, (dw, dh) = letterbox(
                img, self.img_size, auto=False, stride=self.stride)
            boxes = boxes.copy()
            if boxes.size:
                boxes[:, 0::2] = boxes[:, 0::2] * ratio[0] + dw
                boxes[:, 1::2] = boxes[:, 1::2] * ratio[1] + dh
            if self.random_perspective is not None:
                # the reference warps the non-mosaic path too
                # (LoadImagesAndLabels: letterbox -> random_perspective)
                img, boxes, labels = yolo_random_perspective(
                    img, boxes, labels, **self.random_perspective)
        if self.hsv:
            img = augment_hsv(img)
        if self.cutout_prob > 0 and random.random() < self.cutout_prob:
            img = np.ascontiguousarray(img)
            keep = cutout(img, boxes)
            boxes, labels = boxes[keep], labels[keep]
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
