from .anchor_generator import (AnchorGenerator, AnchorGeneratorRotated,
                               AnchorGeneratorRotatedS2ANet,
                               AnchorGeneratorYangXue, SSDAnchorGenerator)
from .anchor_target import (AnchorTargetResult, anchor_inside_flags,
                            anchor_target_single, images_to_levels)
from .assigner import MaxIoUAssigner, MaxIoUAssignerRbbox, assign_wrt_overlaps
from .coder import (DeltaXYWHABBoxCoder, DeltaXYWHBBoxCoder, GVDeltaXYWHBBoxCoder,
                    GVFixCoder, GVRatioCoder, MidpointOffsetCoder,
                    OrientedDeltaXYWHTCoder)
from .iou_calculator import (BboxOverlaps2D, BboxOverlaps2D_rotated,
                             BboxOverlaps2D_rotated_v1, BboxOverlaps2D_v1)
from .sampler import PseudoSampler, RandomSampler, RandomSamplerRotated
