# Ported from the reference config zoo: projects/retinanet/configs/retinanet_r50v1d_fpn_dota1_5.py
# (hyperparameter data — values must match the reference
# recipe for parity; machine-specific dataset paths are
# rewritten to repo-relative datasets/ locations).
# Regenerate with tools/port_reference_configs.py.

model = dict(
    type="RetinaNet",
    backbone=dict(
        type="Resnet50_v1d",
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
        upsample_cfg=dict(
            mode="bilinear",
            tf_mode=True,
        ),
        upsample_div_factor=2,
    ),
    rpn_net=dict(
        type="RetinaHead",
        anchor_generator=dict(
            type="AnchorGeneratorRotated",
            angles=[-90, -75, -60, -45, -30, -15],
            base_sizes=[32, 64, 128, 256, 512],
            mode="H",
            ratios=[1, 0.5, 2.0, 0.3333333333333333, 3.0, 5.0, 0.2],
            scales=[1, 1.2599210498948732, 1.5874010519681994],
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
        dataset_type="DOTA1_5",
        images_dir="datasets/processed_DOTA1_5/test_600_150_1.0/images",
        num_workers=4,
        transforms=[
            dict(
                type="RotatedResize",
                max_size=800,
                min_size=800,
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
        batch_size=3,
        dataset_dir="datasets/processed_DOTA1_5/trainval_600_150_1.0",
        num_workers=4,
        shuffle=True,
        transforms=[
            dict(
                type="RotatedResize",
                max_size=800,
                min_size=800,
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
        version="1_5",
    ),
    val=dict(
        type="DOTADataset",
        batch_size=4,
        dataset_dir="datasets/processed_DOTA1_5/trainval_600_150_1.0",
        num_workers=4,
        shuffle=False,
        transforms=[
            dict(
                type="RotatedResize",
                max_size=800,
                min_size=800,
            ),
            dict(
                type="Normalize",
                mean=[123.675, 116.28, 103.53],
                std=[58.395, 57.12, 57.375],
                to_bgr=False,
            ),
        ],
        version="1_5",
    ),
)

optimizer = dict(
    type="GradMutilpySGD",
    grad_clip=dict(
        max_norm=30.0,
        norm_type=2,
    ),
    lr=0.0015,
    momentum=0.9,
    weight_decay=0.0001,
)

scheduler = dict(
    type="StepLR",
    milestones=[27],
    warmup="linear",
    warmup_iters=14000,
    warmup_ratio=0.1,
)

parameter_groups_generator = dict(
    type="YangXuePrameterGroupsGenerator",
    conv_bias_grad_muyilpy=2.0,
    conv_bias_weight_decay=0.0,
    freeze_prefix=["backbone.C1"],
)

logger = dict(
    type="RunLogger",
)

checkpoint_interval = 1

eval_interval = 10

log_interval = 50

max_epoch = 30

merge_nms_threshold_type = 1

pretrained_weights = "weights/yx_init_pretrained.pk_jt.pk"
