"""Op-level public API (reference ``python/jdet/ops/__init__.py``
surface: box_iou_rotated, nms_rotated, nms_poly, nms, roi_align*,
dcn, orn, fr, convex_sort, bbox transforms)."""

from . import bbox_transforms, box_ops  # noqa: F401
from .bbox_geometry import (bbox_area_nms, bbox_areas,  # noqa: F401
                            bbox_nms, bbox_overlaps)
from .convex_sort import convex_sort  # noqa: F401
from .deform_conv import dcn_offset_grid, deform_conv2d  # noqa: F401
from .dcn_pool import DCNPooling, deform_roi_pooling  # noqa: F401
from .fr import feature_refine  # noqa: F401
from .nms import (bbox_overlaps_hbb, fast_top_k,  # noqa: F401
                  multiclass_nms, nms, nms_mask)
from .nms_poly import (clip_polygons, iou_poly_single,  # noqa: F401
                       multiclass_poly_nms, poly_nms, poly_nms_numpy)
from .nms_rotated import (multiclass_nms_rotated_jit,  # noqa: F401
                          nms_rotated_mask)
from .orn import (active_rotating_filter,  # noqa: F401
                  rotation_invariant_encoding,
                  rotation_invariant_pooling)
from .pallas_roi_align import \
    roi_align_rotated_pyramid_pallas  # noqa: F401
from .roi_align import (ROIAlign, ROIAlignRotated,  # noqa: F401
                        ROIAlignRotated_v1, psroi_align, roi_align,
                        roi_align_rotated, roi_align_rotated_pyramid,
                        roi_pool)
from .rotated_iou import box_iou_rotated, poly_iou  # noqa: F401
