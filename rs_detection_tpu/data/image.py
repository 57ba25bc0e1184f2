"""Unlabeled test-image (tile) dataset.

Capability parity with the reference ``ImageDataset``
(``python/jdet/data/image.py:14-111``): carries ``img_file``,
``ori_img_size``, ``scale_factor`` through to the merge step; supports
flip-TTA tagging via ``flip_mode``.
"""

from __future__ import annotations

import os
from typing import Iterator, List, Optional

import numpy as np
from PIL import Image

from ..utils.registry import DATASETS
from .collate import collate_batch
from .io import load_rgb
from .transforms import Compose

IMG_EXTENSIONS = (".png", ".jpg", ".jpeg", ".bmp", ".tif", ".tiff")


def list_images(images_dir: str) -> List[str]:
    out = []
    for root, _, files in os.walk(images_dir):
        for f in sorted(files):
            if f.lower().endswith(IMG_EXTENSIONS):
                out.append(os.path.join(root, f))
    return sorted(out)


@DATASETS.register_module()
class ImageDataset:
    def __init__(self, images_dir=None, images_file=None,
                 dataset_type="DOTA", transforms=None, batch_size=1,
                 num_workers=0, shuffle=False, max_gt=1):
        self.images = (list_images(images_dir) if images_dir
                       else list(images_file))
        self.dataset_type = dataset_type
        self.transforms = Compose(transforms)
        self.batch_size = batch_size
        self.total_len = len(self.images)

    def __len__(self):
        return self.total_len

    def __getitem__(self, idx: int):
        if "BATCH_IDX" in os.environ:
            idx = int(os.environ["BATCH_IDX"])
        path = self.images[idx]
        image = load_rgb(path)
        target = dict(
            ori_img_size=image.size,
            img_size=image.size,
            scale_factor=1.0,
            img_file=path,
            filename=os.path.basename(path),
        )
        return self.transforms(image, target)

    def batches(self, flip_mode: Optional[str] = None) -> Iterator:
        """Yield (images, targets, metas); ``flip_mode`` in
        {None, 'H', 'V', 'HV'} flips device-side inputs for TTA
        (un-flip happens in the merge step, ``data_merge.py:14-27``)."""
        nb = -(-self.total_len // self.batch_size)
        for b in range(nb):
            idxs = range(b * self.batch_size,
                         min((b + 1) * self.batch_size, self.total_len))
            samples, metas = [], []
            for i in idxs:
                img, tgt = self[i]
                arr = np.asarray(img, np.float32)
                if flip_mode:
                    if "H" in flip_mode:
                        arr = arr[:, ::-1]
                    if "V" in flip_mode:
                        arr = arr[::-1]
                    tgt["flip_mode"] = flip_mode
                samples.append((np.ascontiguousarray(arr), tgt))
                metas.append(tgt)
            # pad the last partial batch to keep shapes static
            while len(samples) < self.batch_size:
                samples.append((np.zeros_like(samples[0][0]), None))
                metas.append(None)
            images, targets = collate_batch(samples, max_gt=1)
            yield images, targets, metas
