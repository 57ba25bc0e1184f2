from .common import (BinaryCrossEntropyLoss, CrossEntropyLoss,
                     CrossEntropyLossForRcnn, FocalLoss, L1Loss,
                     SmoothL1Loss, binary_cross_entropy, l1_loss,
                     sigmoid_focal_loss, smooth_l1_loss,
                     softmax_cross_entropy, weight_reduce_loss)
from .long_tail import (EFLState, EqualizedFocalLoss, EQLv2, EQLv2State,
                        GroupSoftmax, SeesawLoss, SeesawState,
                        SoftDiceLoss)
from .poly_iou_loss import (GDLoss, PolyGIoULoss, PolyIoULoss, gwd_loss,
                            kfiou_loss, kld_loss, poly_giou_loss,
                            poly_iou_loss, xy_wh_r_2_xy_sigma)
