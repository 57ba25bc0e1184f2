"""IoU calculator wrappers (reference
``python/jdet/models/boxes/iou_calculator.py``)."""

from __future__ import annotations

import numpy as np

from ...ops.nms import bbox_overlaps_hbb
from ...ops.rotated_iou import box_iou_rotated
from ...utils.registry import BOXES


@BOXES.register_module()
class BboxOverlaps2D:
    """hbb IoU (reference ``:7``)."""

    def __call__(self, bboxes1, bboxes2, mode="iou", is_aligned=False):
        assert not is_aligned, "aligned mode: use elementwise helpers"
        return bbox_overlaps_hbb(bboxes1[..., :4], bboxes2[..., :4], mode)


@BOXES.register_module(name="BboxOverlaps2D_v1")
class BboxOverlaps2D_v1(BboxOverlaps2D):
    pass


@BOXES.register_module()
class BboxOverlaps2D_rotated:
    """Rotated IoU (reference ``:80``)."""

    def __call__(self, bboxes1, bboxes2, mode="iou", is_aligned=False):
        assert not is_aligned
        return box_iou_rotated(bboxes1[..., :5], bboxes2[..., :5], mode=mode)


@BOXES.register_module(name="BboxOverlaps2D_rotated_v1")
class BboxOverlaps2D_rotated_v1(BboxOverlaps2D_rotated):
    pass


def bbox_overlaps_np(bboxes1, bboxes2, mode="iou"):
    """numpy hbb IoU (reference ``:164-325``)."""
    return np.asarray(bbox_overlaps_hbb(np.asarray(bboxes1, np.float32),
                                        np.asarray(bboxes2, np.float32),
                                        mode))
