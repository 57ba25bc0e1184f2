# Ported from the reference config zoo: configs/orcnn_van3_for_test_2.py
# (hyperparameter data — values must match the reference
# recipe for parity; machine-specific dataset paths are
# rewritten to repo-relative datasets/ locations).
# Regenerate with tools/port_reference_configs.py.

model = dict(
    type="OrientedRCNN",
    backbone=dict(
        type="van_b3",
        img_size=1024,
        num_stages=4,
        out_indices=[0, 1, 2, 3],
        pretrained=False,
    ),
    bbox_head=dict(
        type="OrientedHead",
        assigner=dict(
            type="MaxIoUAssigner",
            assigned_labels_filled=-1,
            ignore_iof_thr=-1,
            iou_calculator=dict(
                type="BboxOverlaps2D_rotated_v1",
            ),
            match_low_quality=False,
            min_pos_iou=0.5,
            neg_iou_thr=0.5,
            pos_iou_thr=0.5,
        ),
        bbox_coder=dict(
            type="OrientedDeltaXYWHTCoder",
            target_means=[0.0, 0.0, 0.0, 0.0, 0.0],
            target_stds=[0.1, 0.1, 0.2, 0.2, 0.1],
        ),
        bbox_roi_extractor=dict(
            type="OrientedSingleRoIExtractor",
            extend_factor=[1.4, 1.2],
            featmap_strides=[4, 8, 16, 32],
            out_channels=256,
            roi_layer=dict(
                type="ROIAlignRotated_v1",
                output_size=7,
                sampling_ratio=2,
            ),
        ),
        end_bbox_type="obb",
        fc_out_channels=1024,
        in_channels=256,
        loss_bbox=dict(
            type="SmoothL1Loss",
            beta=1.0,
            loss_weight=1.0,
        ),
        loss_cls=dict(
            type="CrossEntropyLoss",
        ),
        num_classes=10,
        pos_weight=-1,
        reg_class_agnostic=True,
        reg_decoded_bbox=False,
        reg_dim=None,
        sampler=dict(
            type="RandomSamplerRotated",
            add_gt_as_proposals=True,
            neg_pos_ub=-1,
            num=512,
            pos_fraction=0.25,
        ),
        score_thresh=0.001,
        start_bbox_type="obb",
        with_avg_pool=False,
        with_bbox=True,
        with_cls=True,
        with_reg=True,
        with_shared_head=False,
    ),
    neck=dict(
        type="FPN",
        in_channels=[64, 128, 320, 512],
        num_outs=5,
        out_channels=256,
    ),
    rpn=dict(
        type="OrientedRPNHead",
        anchor_generator=dict(
            type="AnchorGenerator",
            ratios=[0.125, 0.25, 0.5, 1.0, 2.0, 4.0, 8.0],
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
        background_label=0,
        bbox_coder=dict(
            type="MidpointOffsetCoder",
            target_means=[0.0, 0.0, 0.0, 0.0, 0.0, 0.0],
            target_stds=[1.0, 1.0, 1.0, 1.0, 0.5, 0.5],
        ),
        bbox_type="obb",
        feat_channels=256,
        in_channels=256,
        loss_bbox=dict(
            type="SmoothL1Loss",
            beta=0.1111111111111111,
            loss_weight=1.0,
        ),
        loss_cls=dict(
            type="CrossEntropyLossForRcnn",
            loss_weight=1.0,
            use_sigmoid=True,
        ),
        min_bbox_size=0,
        nms_post=4000,
        nms_pre=4000,
        nms_thresh=0.8,
        num_classes=1,
        pos_weight=-1,
        reg_decoded_bbox=False,
        reg_dim=6,
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
        dataset_type="FAIR1M_1_5",
        images_dir="./data/test_ms/test_1024_200_0.5-1.0-1.5/images",
        num_workers=4,
        transforms=[
            dict(
                type="RotatedResize",
                angle_version="le90",
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
    type="AdamW",
    lr=0.0001,
    weight_decay=0.05,
)

scheduler = dict(
    type="StepLR",
    milestones=[7, 10],
    warmup="linear",
    warmup_iters=500,
    warmup_ratio=0.3333333333333333,
)

optimizer_swa = dict(
    type="AdamW",
    lr=0.0001,
    weight_decay=0.05,
)

scheduler_swa = dict(
    type="CosineAnnealingLR",
    min_lr=1e-06,
)

logger = dict(
    type="RunLogger",
)

angle_version = "le90"

checkpoint_interval = 1

dataset_root = "datasets/data/private/LYX/data"

eval_interval = 3

log_interval = 200

max_epoch = 18

merge_nms_threshold_type = 1

model_only = True

num_classes = 10

resume_path = "work_dirs/orcnn_van3_7_anchor_swa_2/checkpoints/swa_8-9.pkl"

swa_start_epoch = 12
