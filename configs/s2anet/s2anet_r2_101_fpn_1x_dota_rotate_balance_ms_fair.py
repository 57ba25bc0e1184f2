# Ported from the reference config zoo: configs/s2anet/s2anet_r2_101_fpn_1x_dota_rotate_balance_ms_fair.py
# (hyperparameter data — values must match the reference
# recipe for parity; machine-specific dataset paths are
# rewritten to repo-relative datasets/ locations).
# Regenerate with tools/port_reference_configs.py.

model = dict(
    type="S2ANet",
    backbone=dict(
        type="res2net101_26w_4s",
        frozen_stages=1,
        pretrained=True,
        return_stages=["layer1", "layer2", "layer3", "layer4"],
    ),
    bbox_head=dict(
        type="S2ANetHead",
        anchor_ratios=[1.0],
        anchor_scales=[4],
        anchor_strides=[8, 16, 32, 64, 128],
        feat_channels=256,
        in_channels=256,
        loss_fam_bbox=dict(
            type="SmoothL1Loss",
            beta=0.1111111111111111,
            loss_weight=1.0,
        ),
        loss_fam_cls=dict(
            type="FocalLoss",
            alpha=0.25,
            gamma=2.0,
            loss_weight=1.0,
            use_sigmoid=True,
        ),
        loss_odm_bbox=dict(
            type="SmoothL1Loss",
            beta=0.1111111111111111,
            loss_weight=1.0,
        ),
        loss_odm_cls=dict(
            type="FocalLoss",
            alpha=0.25,
            gamma=2.0,
            loss_weight=1.0,
            use_sigmoid=True,
        ),
        num_classes=38,
        stacked_convs=2,
        target_means=[0.0, 0.0, 0.0, 0.0, 0.0],
        target_stds=[1.0, 1.0, 1.0, 1.0, 1.0],
        test_cfg=dict(
            max_per_img=2000,
            min_bbox_size=0,
            nms=dict(
                type="nms_rotated",
                iou_thr=0.1,
            ),
            nms_pre=2000,
            score_thr=0.05,
        ),
        train_cfg=dict(
            fam_cfg=dict(
                allowed_border=-1,
                assigner=dict(
                    type="MaxIoUAssigner",
                    ignore_iof_thr=-1,
                    iou_calculator=dict(
                        type="BboxOverlaps2D_rotated",
                    ),
                    min_pos_iou=0,
                    neg_iou_thr=0.4,
                    pos_iou_thr=0.5,
                ),
                bbox_coder=dict(
                    type="DeltaXYWHABBoxCoder",
                    clip_border=True,
                    target_means=[0.0, 0.0, 0.0, 0.0, 0.0],
                    target_stds=[1.0, 1.0, 1.0, 1.0, 1.0],
                ),
                debug=False,
                pos_weight=-1,
            ),
            odm_cfg=dict(
                allowed_border=-1,
                assigner=dict(
                    type="MaxIoUAssigner",
                    ignore_iof_thr=-1,
                    iou_calculator=dict(
                        type="BboxOverlaps2D_rotated",
                    ),
                    min_pos_iou=0,
                    neg_iou_thr=0.4,
                    pos_iou_thr=0.5,
                ),
                bbox_coder=dict(
                    type="DeltaXYWHABBoxCoder",
                    clip_border=True,
                    target_means=[0.0, 0.0, 0.0, 0.0, 0.0],
                    target_stds=[1.0, 1.0, 1.0, 1.0, 1.0],
                ),
                debug=False,
                pos_weight=-1,
            ),
        ),
        with_orconv=True,
    ),
    neck=dict(
        type="FPN",
        add_extra_convs="on_input",
        in_channels=[256, 512, 1024, 2048],
        num_outs=5,
        out_channels=256,
        start_level=1,
    ),
)

dataset = dict(
    test=dict(
        type="ImageDataset",
        batch_size=1,
        dataset_type="FAIR",
        images_dir="datasets/data/lxl/dataset/fair_1024/test_1024_200_0.5-1.0-1.5/images",
        num_workers=4,
        transforms=[
            dict(
                type="RotatedResize",
                max_size=1024,
                min_size=1024,
            ),
            dict(
                type="Pad",
                size_divisor=32,
            ),
            dict(
                type="Normalize",
                mean=[123.675, 116.28, 103.53],
                std=[58.395, 57.12, 57.375],
                to_bgr=False,
            ),
        ],
    ),
    train=dict(
        type="FAIRDataset",
        balance_category=True,
        batch_size=2,
        dataset_dir="datasets/data/lxl/dataset/fair_1024/trainval_1024_200_0.5-1.0-1.5",
        filter_empty_gt=False,
        num_workers=4,
        shuffle=True,
        transforms=[
            dict(
                type="RotatedResize",
                max_size=1024,
                min_size=1024,
            ),
            dict(
                type="RotatedRandomFlip",
                prob=0.5,
            ),
            dict(
                type="RandomRotateAug",
                random_rotate_on=True,
            ),
            dict(
                type="Pad",
                size_divisor=32,
            ),
            dict(
                type="Normalize",
                mean=[123.675, 116.28, 103.53],
                std=[58.395, 57.12, 57.375],
                to_bgr=False,
            ),
        ],
    ),
    val=dict(
        type="FAIRDataset",
        batch_size=2,
        dataset_dir="datasets/data/lxl/dataset/fair_1024/trainval_1024_200_0.5-1.0-1.5",
        num_workers=4,
        shuffle=False,
        transforms=[
            dict(
                type="RotatedResize",
                max_size=1024,
                min_size=1024,
            ),
            dict(
                type="Pad",
                size_divisor=32,
            ),
            dict(
                type="Normalize",
                mean=[123.675, 116.28, 103.53],
                std=[58.395, 57.12, 57.375],
                to_bgr=False,
            ),
        ],
    ),
)

optimizer = dict(
    type="SGD",
    grad_clip=dict(
        max_norm=35,
        norm_type=2,
    ),
    lr=0.0025,
    momentum=0.9,
    weight_decay=0.0001,
)

scheduler = dict(
    type="StepLR",
    milestones=[7, 10],
    warmup="linear",
    warmup_iters=500,
    warmup_ratio=0.3333333333333333,
)

logger = dict(
    type="RunLogger",
)

checkpoint_interval = 1

data_root = "datasets/data/lxl/dataset/fair_1024"

eval_interval = 12

log_interval = 50

max_epoch = 12

train_root = "datasets/data/lxl/dataset/fair_1024/trainval_1024_200_0.5-1.0-1.5"
