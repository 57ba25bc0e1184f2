# Ported from the reference config zoo: projects/gliding/configs/gliding_r50_fpn_1x_dota_with_flip.py
# (hyperparameter data — values must match the reference
# recipe for parity; machine-specific dataset paths are
# rewritten to repo-relative datasets/ locations).
# Regenerate with tools/port_reference_configs.py.

model = dict(
    type="GlidingVertex",
    backbone=dict(
        type="Resnet50",
        frozen_stages=1,
        pretrained=True,
        return_stages=["layer1", "layer2", "layer3", "layer4"],
    ),
    bbox_head=dict(
        type="GlidingHead",
        assigner=dict(
            type="MaxIoUAssigner",
            assigned_labels_filled=-1,
            ignore_iof_thr=-1,
            iou_calculator=dict(
                type="BboxOverlaps2D",
            ),
            match_low_quality=False,
            min_pos_iou=0.5,
            neg_iou_thr=0.5,
            pos_iou_thr=0.5,
        ),
        bbox_coder=dict(
            type="GVDeltaXYWHBBoxCoder",
            target_means=[0.0, 0.0, 0.0, 0.0],
            target_stds=[0.1, 0.1, 0.2, 0.2],
        ),
        bbox_loss=dict(
            type="SmoothL1Loss",
            beta=1.0,
            loss_weight=1.0,
        ),
        bbox_roi_extractor=dict(
            type="SingleRoIExtractor",
            featmap_strides=[4, 8, 16, 32],
            out_channels=256,
            roi_layer=dict(
                type="ROIAlign",
                output_size=7,
                sampling_ratio=2,
                version=1,
            ),
        ),
        box_weights=[10.0, 10.0, 5.0, 5.0],
        cls_loss=dict(
            type="CrossEntropyLoss",
        ),
        detections_per_img=2000,
        end_bbox_type="poly",
        fix_coder=dict(
            type="GVFixCoder",
        ),
        fix_loss=dict(
            type="SmoothL1Loss",
            beta=0.3333333333333333,
            loss_weight=1.0,
        ),
        in_channels=256,
        max_per_img=2000,
        nms_thresh=0.3,
        num_classes=15,
        pooler_resolution=7,
        pooler_sampling_ratio=0,
        pooler_scales=[0.25, 0.125, 0.0625, 0.03125, 0.015625],
        pos_weight=-1,
        ratio_coder=dict(
            type="GVRatioCoder",
        ),
        ratio_loss=dict(
            type="SmoothL1Loss",
            beta=0.3333333333333333,
            loss_weight=16.0,
        ),
        ratio_thr=0.8,
        reg_class_agnostic=False,
        representation_dim=1024,
        sampler=dict(
            type="RandomSampler",
            add_gt_as_proposals=True,
            neg_pos_ub=-1,
            num=512,
            pos_fraction=0.25,
        ),
        score_thresh=0.05,
        start_bbox_type="hbb",
        with_avg_pool=False,
        with_bbox=True,
        with_shared_head=False,
    ),
    neck=dict(
        type="FPN",
        in_channels=[256, 512, 1024, 2048],
        num_outs=5,
        out_channels=256,
    ),
    rpn=dict(
        type="GlidingRPNHead",
        anchor_generator=dict(
            type="AnchorGenerator",
            ratios=[0.5, 1.0, 2.0],
            scales=[8],
            strides=[4, 8, 16, 32, 64],
        ),
        assigner=dict(
            type="MaxIoUAssigner",
            assigned_labels_filled=-1,
            ignore_iof_thr=-1,
            match_low_quality=True,
            min_pos_iou=0.3,
            neg_iou_thr=0.3,
            pos_iou_thr=0.7,
        ),
        bbox_coder=dict(
            type="GVDeltaXYWHBBoxCoder",
            target_means=[0.0, 0.0, 0.0, 0.0],
            target_stds=[1.0, 1.0, 1.0, 1.0],
        ),
        feat_channels=256,
        in_channels=256,
        loss_bbox=dict(
            type="SmoothL1Loss",
            beta=0.1111111111111111,
            loss_weight=1.0,
        ),
        loss_cls=dict(
            type="CrossEntropyLoss",
            loss_weight=1.0,
        ),
        min_bbox_size=0,
        nms_post=2000,
        nms_pre=2000,
        nms_thresh=0.7,
        num_classes=2,
        sampler=dict(
            type="RandomSampler",
            add_gt_as_proposals=False,
            neg_pos_ub=-1,
            num=256,
            pos_fraction=0.5,
        ),
    ),
)

dataset = dict(
    test=dict(
        type="ImageDataset",
        batch_size=1,
        images_dir="datasets/processed_DOTA/test_1024_200_1.0/images",
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
                to_bgr=True,
            ),
        ],
    ),
    train=dict(
        type="DOTADataset",
        balance_category=False,
        batch_size=2,
        dataset_dir="datasets/processed_DOTA/trainval_1024_200_1.0",
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
                type="Pad",
                size_divisor=32,
            ),
            dict(
                type="Normalize",
                mean=[123.675, 116.28, 103.53],
                std=[58.395, 57.12, 57.375],
                to_bgr=True,
            ),
        ],
    ),
    val=dict(
        type="DOTADataset",
        batch_size=2,
        dataset_dir="datasets/processed_DOTA/trainval_1024_200_1.0",
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
    lr=0.005,
    momentum=0.9,
    weight_decay=0.0001,
)

scheduler = dict(
    type="StepLR",
    milestones=[7, 10],
    warmup="linear",
    warmup_iters=500,
    warmup_ratio=0.001,
)

logger = dict(
    type="RunLogger",
)

checkpoint_interval = 1

eval_interval = 1

log_interval = 50

max_epoch = 12
