"""Datasets: CustomDataset (mmdet-style labels.pkl) + data loader.

Capability parity with the reference ``CustomDataset``
(``python/jdet/data/custom.py:14-119``): pkl annotation format
(filename/width/height/ann{bboxes(n,5), labels, bboxes_ignore}), hbox +
poly derivation from rboxes at load, empty-GT filtering or
random-resample, transform pipeline.

TPU-first: batching goes through ``collate.collate_batch`` (dense
padded GT arrays, fixed shapes); the loader is a plain Python iterable
with background-thread prefetch feeding ``jax.device_put`` — workers
can be added per-process without touching the device path.
"""

from __future__ import annotations

import os
import pickle
import queue
import threading
from typing import Iterator, List, Optional

import numpy as np
from PIL import Image
from .io import load_rgb

from ..ops.box_ops import rotated_box_to_bbox_np
from ..utils.registry import DATASETS
from .collate import collate_batch
from .transforms import Compose


@DATASETS.register_module()
class CustomDataset:
    CLASSES: Optional[List[str]] = None

    def __init__(self, images_dir=None, annotations_file=None,
                 dataset_dir=None, transforms=None, batch_size=1,
                 num_workers=0, shuffle=False, drop_last=False,
                 filter_empty_gt=True, filter_min_size=-1, max_gt=512):
        if dataset_dir is not None:
            images_dir = os.path.join(dataset_dir, "images")
            annotations_file = os.path.join(dataset_dir, "labels.pkl")
        self.images_dir = os.path.abspath(images_dir)
        self.annotations_file = os.path.abspath(annotations_file)
        self.transforms = Compose(transforms)
        self.batch_size = batch_size
        self.num_workers = num_workers
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.filter_empty_gt = filter_empty_gt
        self.max_gt = max_gt

        with open(self.annotations_file, "rb") as f:
            self.img_infos = pickle.load(f)
        if filter_empty_gt:
            self.img_infos = [
                info for info in self.img_infos
                if len(info["ann"]["bboxes"]) > 0
                and min(info["width"], info["height"]) >= filter_min_size]
        self.total_len = len(self.img_infos)

    def __len__(self):
        return self.total_len

    def _read_ann_info(self, idx: int):
        # empty tiles never reach the model: resample like the
        # reference (custom.py:58-63)
        while True:
            info = self.img_infos[idx]
            if len(info["ann"]["bboxes"]) > 0:
                break
            idx = int(np.random.randint(self.total_len))
        ann = info["ann"]
        img_path = os.path.join(self.images_dir, info["filename"])
        image = load_rgb(img_path)
        width, height = image.size

        hboxes, polys = rotated_box_to_bbox_np(ann["bboxes"])
        hboxes_ig, polys_ig = rotated_box_to_bbox_np(
            ann.get("bboxes_ignore", np.zeros((0, 5), np.float32)))
        target = dict(
            rboxes=np.asarray(ann["bboxes"], np.float32),
            hboxes=hboxes, polys=polys,
            labels=np.asarray(ann["labels"], np.int32),
            rboxes_ignore=np.asarray(
                ann.get("bboxes_ignore", np.zeros((0, 5))), np.float32),
            hboxes_ignore=hboxes_ig, polys_ignore=polys_ig,
            classes=self.CLASSES,
            ori_img_size=(width, height), img_size=(width, height),
            scale_factor=1.0, filename=info["filename"],
            img_file=img_path)
        return image, target

    def __getitem__(self, idx: int):
        if "BATCH_IDX" in os.environ:
            idx = int(os.environ["BATCH_IDX"])
        image, target = self._read_ann_info(idx)
        return self.transforms(image, target)

    def batches(self, seed: Optional[int] = None) -> Iterator:
        """Yield (images, targets, metas) batches for one epoch.

        ``num_workers > 0`` decodes/transforms the batch's samples on a
        thread pool (the reference's multi-worker loader analogue —
        PIL jpeg decode and the numpy transform pipeline release the
        GIL, so threads scale here without fork overhead)."""
        order = np.arange(self.total_len)
        if self.shuffle:
            np.random.RandomState(seed).shuffle(order)
        nb = self.total_len // self.batch_size if self.drop_last \
            else -(-self.total_len // self.batch_size)
        # one pool per dataset, created lazily and reused across epochs
        # — a per-epoch pool leaks idle worker threads whenever the
        # iterator is abandoned mid-epoch (e.g. Runner.train breaking on
        # self.finish) since generator finalization is GC-dependent
        pool = self._worker_pool()
        for b in range(nb):
            idxs = order[b * self.batch_size:(b + 1) * self.batch_size]
            if len(idxs) == 0:
                break
            if pool is not None:
                items = list(pool.map(
                    lambda i: self[int(i)], idxs))
            else:
                items = [self[int(i)] for i in idxs]
            samples, metas = [], []
            for img, tgt in items:
                samples.append((np.asarray(img, np.float32), tgt))
                metas.append(tgt)
            images, targets = collate_batch(samples, self.max_gt)
            yield images, targets, metas

    def _worker_pool(self):
        if self.num_workers <= 0:
            return None
        pool = getattr(self, "_pool", None)
        if pool is None:
            from concurrent.futures import ThreadPoolExecutor
            pool = self._pool = ThreadPoolExecutor(
                max_workers=self.num_workers)
        return pool

    def close(self):
        """Release the worker thread pool (safe to call repeatedly)."""
        pool = getattr(self, "_pool", None)
        if pool is not None:
            pool.shutdown(wait=False)
            self._pool = None

    def prefetch(self, seed=None, depth: int = 2) -> Iterator:
        """Background-thread prefetching wrapper around ``batches``."""
        q: queue.Queue = queue.Queue(maxsize=depth)
        stop = object()

        def worker():
            try:
                for item in self.batches(seed):
                    q.put(item)
            finally:
                q.put(stop)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is stop:
                break
            yield item

    def evaluate(self, results, work_dir, epoch, logger=None):
        raise NotImplementedError
