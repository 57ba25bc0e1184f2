"""Import all model modules so registry entries are populated."""
from . import losses  # noqa: F401
from . import param_generators  # noqa: F401
from .backbones import (convnext, jimm_scope, lsknet,  # noqa: F401
                        res2net, resnet, sk2res2net, ssd_vgg, swin,
                        van)
from .boxes import (anchor_generator, anchor_target, assigner, coder,  # noqa: F401
                    iou_calculator, sampler)
from .necks import fpn, ssd_neck  # noqa: F401
from .roi_extractors import oriented_single_level  # noqa: F401
from .roi_heads import (fcos_head, gliding_head, oriented_head,  # noqa: F401
                        oriented_head_variants, oriented_rpn_head,
                        rbbox_head, retina_head, rpn_head, s2anet_head,
                        ssd_head)
from .networks import (gliding_vertex, r3det, rcnn, roi_transformer,  # noqa: F401
                       single_stage, yolo)
