# Ported from the reference config zoo: projects/oriented_rcnn/configs/orcnn_r101_fpn_ms_flip_rotate_bc_le90_seesaw.py
# (hyperparameter data — values must match the reference
# recipe for parity; machine-specific dataset paths are
# rewritten to repo-relative datasets/ locations).
# Regenerate with tools/port_reference_configs.py.

model = dict(
    type="OrientedRCNN",
    backbone=dict(
        type="Resnet101",
        frozen_stages=1,
        pretrained=True,
        return_stages=["layer1", "layer2", "layer3", "layer4"],
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
            type="SeesawLoss",
            loss_weight=1.0,
            num_classes=10,
            p=0.8,
            q=2.0,
            return_dict=False,
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
        score_thresh=0.05,
        start_bbox_type="obb",
        with_avg_pool=False,
        with_bbox=True,
        with_cls=True,
        with_reg=True,
        with_shared_head=False,
    ),
    neck=dict(
        type="FPN",
        in_channels=[256, 512, 1024, 2048],
        num_outs=5,
        out_channels=256,
    ),
    rpn=dict(
        type="OrientedRPNHead",
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
        nms_post=2000,
        nms_pre=2000,
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
        images_dir="datasets/preprocessed_ms_le90/test_1024_200_0.5-1.0-1.5/images",
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
    train=dict(
        type="FAIR1M_1_5_Dataset",
        batch_size=8,
        dataset_dir="datasets/preprocessed_ms_le90/train_1024_200_0.5-1.0-1.5",
        filter_empty_gt=False,
        num_workers=16,
        shuffle=True,
        transforms=[
            dict(
                type="RotatedResize",
                angle_version="le90",
                max_size=1024,
                min_size=1024,
            ),
            dict(
                type="RotatedRandomFlip",
                prob=0.5,
            ),
            dict(
                type="RandomRotateAug",
                angle_version="le90",
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
        type="FAIR1M_1_5_Dataset",
        batch_size=8,
        dataset_dir="datasets/preprocessed_ms_le90/train_1024_200_0.5-1.0-1.5",
        num_workers=16,
        shuffle=False,
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

angle_version = "le90"

checkpoint_interval = 1

dataset_root = "datasets/yimian"

eval_interval = 100

log_interval = 50

max_epoch = 12

num_classes = 10
