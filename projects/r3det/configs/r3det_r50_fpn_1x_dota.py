# Ported from the reference config zoo: projects/r3det/configs/r3det_r50_fpn_1x_dota.py
# (hyperparameter data — values must match the reference
# recipe for parity; machine-specific dataset paths are
# rewritten to repo-relative datasets/ locations).
# Regenerate with tools/port_reference_configs.py.

model = dict(
    type="R3Det",
    backbone=dict(
        type="Resnet50",
        frozen_stages=1,
        pretrained=True,
        return_stages=["layer1", "layer2", "layer3", "layer4"],
    ),
    bbox_head=dict(
        type="RRetinaHead",
        anchor_generator=dict(
            type="RAnchorGenerator",
            angles=None,
            octave_base_scale=4,
            ratios=[1.0, 0.5, 2.0, 0.3333333333333333, 3.0, 0.2, 5.0],
            scales_per_octave=3,
            strides=[8, 16, 32, 64, 128],
        ),
        bbox_coder=dict(
            type="DeltaXYWHABBoxCoder",
            target_means=[0.0, 0.0, 0.0, 0.0, 0.0],
            target_stds=[1.0, 1.0, 1.0, 1.0, 1.0],
        ),
        feat_channels=256,
        in_channels=256,
        loss_bbox=dict(
            type="SmoothL1Loss",
            beta=0.11,
            loss_weight=1.0,
        ),
        loss_cls=dict(
            type="FocalLoss",
            alpha=0.25,
            gamma=2.0,
            loss_weight=1.0,
            use_sigmoid=True,
        ),
        num_classes=15,
        stacked_convs=4,
        use_h_gt=True,
    ),
    frm_cfgs=[
        dict(
            featmap_strides=[8, 16, 32, 64, 128],
            in_channels=256,
        ),
        dict(
            featmap_strides=[8, 16, 32, 64, 128],
            in_channels=256,
        ),
    ],
    neck=dict(
        type="FPN",
        add_extra_convs="on_input",
        in_channels=[256, 512, 1024, 2048],
        num_outs=5,
        out_channels=256,
        start_level=1,
    ),
    num_refine_stages=2,
    refine_heads=[
        dict(
            type="RRetinaRefineHead",
            anchor_generator=dict(
                type="PseudoAnchorGenerator",
                strides=[8, 16, 32, 64, 128],
            ),
            bbox_coder=dict(
                type="DeltaXYWHABBoxCoder",
                target_means=[0.0, 0.0, 0.0, 0.0, 0.0],
                target_stds=[1.0, 1.0, 1.0, 1.0, 1.0],
            ),
            feat_channels=256,
            in_channels=256,
            loss_bbox=dict(
                type="SmoothL1Loss",
                beta=0.11,
                loss_weight=1.0,
            ),
            loss_cls=dict(
                type="FocalLoss",
                alpha=0.25,
                gamma=2.0,
                loss_weight=1.0,
                use_sigmoid=True,
            ),
            num_classes=15,
            stacked_convs=4,
        ),
        dict(
            type="RRetinaRefineHead",
            anchor_generator=dict(
                type="PseudoAnchorGenerator",
                strides=[8, 16, 32, 64, 128],
            ),
            bbox_coder=dict(
                type="DeltaXYWHABBoxCoder",
                target_means=[0.0, 0.0, 0.0, 0.0, 0.0],
                target_stds=[1.0, 1.0, 1.0, 1.0, 1.0],
            ),
            feat_channels=256,
            in_channels=256,
            loss_bbox=dict(
                type="SmoothL1Loss",
                beta=0.11,
                loss_weight=1.0,
            ),
            loss_cls=dict(
                type="FocalLoss",
                alpha=0.25,
                gamma=2.0,
                loss_weight=1.0,
                use_sigmoid=True,
            ),
            num_classes=15,
            stacked_convs=4,
        ),
    ],
)

merge_cfg = dict(
    max_per_img=1000,
    nms=dict(
        type="rnms",
        iou_thr={
            "baseball-diamond": 0.3,
            "basketball-court": 0.3,
            "bridge": 0.0001,
            "ground-track-field": 0.3,
            "harbor": 0.0001,
            "helicopter": 0.2,
            "large-vehicle": 0.05,
            "plane": 0.3,
            "roundabout": 0.1,
            "ship": 0.05,
            "small-vehicle": 0.05,
            "soccer-ball-field": 0.3,
            "storage-tank": 0.1,
            "swimming-pool": 0.1,
            "tennis-court": 0.3,
        },
    ),
    nms_pre=2000,
    score_thr=0.1,
)

merge_nms_iou_thr_dict = {
    "baseball-diamond": 0.3,
    "basketball-court": 0.3,
    "bridge": 0.0001,
    "ground-track-field": 0.3,
    "harbor": 0.0001,
    "helicopter": 0.2,
    "large-vehicle": 0.05,
    "plane": 0.3,
    "roundabout": 0.1,
    "ship": 0.05,
    "small-vehicle": 0.05,
    "soccer-ball-field": 0.3,
    "storage-tank": 0.1,
    "swimming-pool": 0.1,
    "tennis-court": 0.3,
}

test_cfg = dict(
    max_per_img=100,
    merge_cfg=dict(
        max_per_img=1000,
        nms=dict(
            type="rnms",
            iou_thr={
                "baseball-diamond": 0.3,
                "basketball-court": 0.3,
                "bridge": 0.0001,
                "ground-track-field": 0.3,
                "harbor": 0.0001,
                "helicopter": 0.2,
                "large-vehicle": 0.05,
                "plane": 0.3,
                "roundabout": 0.1,
                "ship": 0.05,
                "small-vehicle": 0.05,
                "soccer-ball-field": 0.3,
                "storage-tank": 0.1,
                "swimming-pool": 0.1,
                "tennis-court": 0.3,
            },
        ),
        nms_pre=2000,
        score_thr=0.1,
    ),
    nms=dict(
        type="rnms",
        iou_thr=0.05,
    ),
    nms_pre=1000,
    score_thr=0.1,
)

train_cfg = dict(
    s0=dict(
        allowed_border=-1,
        assigner=dict(
            type="MaxIoUAssigner",
            ignore_iof_thr=-1,
            iou_calculator=dict(
                type="RBboxOverlaps2D",
            ),
            min_pos_iou=0,
            neg_iou_thr=0.4,
            pos_iou_thr=0.5,
        ),
        debug=False,
        pos_weight=-1,
    ),
    sr=[
        dict(
            allowed_border=-1,
            assigner=dict(
                type="MaxIoUAssigner",
                ignore_iof_thr=-1,
                iou_calculator=dict(
                    type="RBboxOverlaps2D",
                ),
                min_pos_iou=0,
                neg_iou_thr=0.5,
                pos_iou_thr=0.6,
            ),
            debug=False,
            pos_weight=-1,
        ),
        dict(
            allowed_border=-1,
            assigner=dict(
                type="MaxIoUAssigner",
                ignore_iof_thr=-1,
                iou_calculator=dict(
                    type="RBboxOverlaps2D",
                ),
                min_pos_iou=0,
                neg_iou_thr=0.6,
                pos_iou_thr=0.7,
            ),
            debug=False,
            pos_weight=-1,
        ),
    ],
    stage_loss_weights=[1.0, 1.0],
)
