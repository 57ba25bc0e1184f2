# Ported from the reference config zoo: projects/retinanet/configs/retinanet_obb_r50_fpn_dota.py
# (hyperparameter data — values must match the reference
# recipe for parity; machine-specific dataset paths are
# rewritten to repo-relative datasets/ locations).
# Regenerate with tools/port_reference_configs.py.

model = dict(
    type="RetinaNet",
    backbone=dict(
        type="Resnet50",
        frozen_stages=1,
        pretrained=True,
        return_stages=["layer1", "layer2", "layer3", "layer4"],
    ),
    neck=dict(
        type="FPN",
        add_extra_convs="on_input",
        in_channels=[256, 512, 1024, 2048],
        num_outs=5,
        out_channels=256,
        start_level=1,
    ),
    rpn_net=dict(
        type="RetinaHead",
        anchor_generator=dict(
            type="AnchorGeneratorRotated",
            mode="H",
            ratios=[0.5, 1.0, 2.0],
            scales=[4.0, 5.0396842, 6.34960421],
            strides=[8, 16, 32, 64, 128],
        ),
        cls_loss_weight=1.0,
        in_channels=256,
        loc_loss_weight=0.2,
        max_dets=10000,
        mode="R",
        n_class=15,
        nms_iou_threshold=0.3,
        roi_beta=0.1111111111111111,
        score_threshold=0.05,
        stacked_convs=4,
    ),
)

dataset = dict(
    test=dict(
        type="ImageDataset",
        batch_size=32,
        images_dir="datasets/processed_DOTA/test_1024_200_1.0/images",
        num_workers=4,
        transforms=[
            dict(
                type="RotatedResize",
                max_size=1024,
                min_size=1024,
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
                direction="horizontal",
                prob=0.5,
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
    type="GradMutilpySGD",
    grad_clip=dict(
        max_norm=35.0,
        norm_type=2,
    ),
    lr=0.005,
    momentum=0.9,
    weight_decay=0.0001,
)

scheduler = dict(
    type="StepLR",
    milestones=[8, 11],
    warmup="linear",
    warmup_iters=500,
    warmup_ratio=0.001,
)

logger = dict(
    type="RunLogger",
)

checkpoint_interval = 1

eval_interval = 10

log_interval = 50

max_epoch = 12

merge_nms_threshold_type = 1

pretrained_weights = "weights/obb_epoch_1.pk"
