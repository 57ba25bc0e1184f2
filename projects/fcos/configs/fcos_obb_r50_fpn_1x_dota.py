# Ported from the reference config zoo: projects/fcos/configs/fcos_obb_r50_fpn_1x_dota.py
# (hyperparameter data — values must match the reference
# recipe for parity; machine-specific dataset paths are
# rewritten to repo-relative datasets/ locations).
# Regenerate with tools/port_reference_configs.py.

model = dict(
    type="FCOS",
    backbone=dict(
        type="Resnet50",
        frozen_stages=1,
        norm_eval=True,
        pretrained=True,
        return_stages=["layer1", "layer2", "layer3", "layer4"],
    ),
    neck=dict(
        type="FPN",
        add_extra_convs="on_output",
        in_channels=[256, 512, 1024, 2048],
        num_outs=5,
        out_channels=256,
        relu_before_extra_convs=True,
        start_level=1,
    ),
    roi_heads=dict(
        type="FCOSHead",
        feat_channels=256,
        in_channels=256,
        loss_bbox=dict(
            type="PolyIoULoss",
            loss_weight=1.0,
        ),
        loss_centerness=dict(
            type="CrossEntropyLoss",
            loss_weight=1.0,
            use_bce=True,
        ),
        loss_cls=dict(
            type="FocalLoss",
            alpha=0.25,
            gamma=2.0,
            loss_weight=1.0,
        ),
        norm_on_bbox=True,
        num_classes=15,
        scale_theta=True,
        stacked_convs=4,
        strides=[8, 16, 32, 64, 128],
        test_cfg=dict(
            centerness_factor=0.5,
            max_per_img=2000,
            min_bbox_size=0,
            nms=dict(
                type="obb_nms",
                iou_thr=0.1,
            ),
            nms_pre=1000,
            score_thr=0.05,
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
                to_bgr=False,
            ),
        ],
    ),
    train=dict(
        type="DOTADataset",
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
                to_bgr=False,
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
    lr=0.0025,
    momentum=0.9,
    weight_decay=0.0001,
)

scheduler = dict(
    type="StepLR",
    milestones=[8, 11],
    warmup="linear",
    warmup_iters=500,
    warmup_ratio=0.3333333333333333,
)

logger = dict(
    type="RunLogger",
)

checkpoint_interval = 1

eval_interval = 12

log_interval = 50

max_epoch = 12
