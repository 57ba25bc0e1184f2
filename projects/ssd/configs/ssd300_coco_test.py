# Ported from the reference config zoo: projects/ssd/configs/ssd300_coco_test.py
# (hyperparameter data — values must match the reference
# recipe for parity; machine-specific dataset paths are
# rewritten to repo-relative datasets/ locations).
# Regenerate with tools/port_reference_configs.py.

model = dict(
    type="SingleStageDetector",
    backbone=dict(
        type="SSD_VGG16",
        input_size=300,
        pretrained="test_datas_ssd/vgg16_caffe.pkl",
    ),
    neck=dict(
        type="SSDNeck",
        in_channels=[512, 1024],
        l2_norm_scale=20,
        level_paddings=[1, 1, 0, 0],
        level_strides=[2, 2, 1, 1],
        out_channels=[512, 1024, 512, 256, 256, 256],
    ),
    roi_heads=dict(
        type="SSDHead",
        anchor_generator=dict(
            type="SSDAnchorGenerator",
            basesize_ratio_range=[0.15, 0.9],
            input_size=300,
            ratios=[[2], [2, 3], [2, 3], [2, 3], [2], [2]],
            scale_major=False,
            strides=[8, 16, 32, 64, 100, 300],
        ),
        bbox_coder_cfg=dict(
            type="DeltaXYWHBBoxCoder",
            target_means=[0.0, 0.0, 0.0, 0.0],
            target_stds=[0.1, 0.1, 0.2, 0.2],
        ),
        in_channels=[512, 1024, 512, 256, 256, 256],
        num_classes=80,
        test_cfg=dict(
            max_per_img=200,
            min_bbox_size=0,
            nms=dict(
                type="nms",
                iou_threshold=0.45,
            ),
            nms_pre=1000,
            score_thr=0.02,
            use_sigmoid_cls=False,
        ),
        train_cfg=dict(
            allowed_border=-1,
            assigner=dict(
                type="MaxIoUAssigner",
                gt_max_assign_all=False,
                ignore_iof_thr=-1,
                min_pos_iou=0.0,
                neg_iou_thr=0.5,
                pos_iou_thr=0.5,
            ),
            debug=False,
            neg_pos_ratio=3,
            pos_weight=-1,
            smoothl1_beta=1.0,
        ),
    ),
)

dataset = dict(
    test=dict(
        type="COCODataset",
        anno_file="datasets/coco/annotations/instances_val2017.json",
        batch_size=1,
        num_workers=1,
        root="datasets/coco/images/val2017",
        transforms=[
            dict(
                type="Resize_keep_ratio",
                keep_ratio=False,
                max_size=300,
                min_size=300,
            ),
            dict(
                type="Normalize",
                mean=[123.675, 116.28, 103.53],
                std=[1, 1, 1],
                to_bgr=True,
            ),
        ],
    ),
    train=dict(
        type="COCODataset",
        anno_file="datasets/coco/annotations/instances_train2017.json",
        batch_size=1,
        num_workers=1,
        root="datasets/coco/images/train2017",
        shuffle=False,
        transforms=[
            dict(
                type="Resize_keep_ratio",
                keep_ratio=False,
                max_size=300,
                min_size=300,
            ),
            dict(
                type="Normalize",
                mean=[123.675, 116.28, 103.53],
                std=[1, 1, 1],
                to_bgr=True,
            ),
        ],
    ),
    val=dict(
        type="COCODataset",
        anno_file="datasets/coco/annotations/instances_val2017.json",
        batch_size=2,
        num_workers=2,
        root="datasets/coco/images/val2017",
        transforms=[
            dict(
                type="Resize_keep_ratio",
                keep_ratio=False,
                max_size=300,
                min_size=300,
            ),
            dict(
                type="Normalize",
                mean=[123.675, 116.28, 103.53],
                std=[1, 1, 1],
                to_bgr=True,
            ),
        ],
    ),
)

optimizer = dict(
    type="SGD",
    lr=0.002,
    momentum=0.9,
    weight_decay=0.0005,
)

scheduler = dict(
    type="StepLR",
    milestones=[45, 55],
    warmup="linear",
    warmup_iters=1000,
    warmup_ratio=0.001,
)

logger = dict(
    type="RunLogger",
)

checkpoint_interval = 3

eval_interval = 3

img_norm_cfg = dict(
    mean=[123.675, 116.28, 103.53],
    std=[1, 1, 1],
)

input_size = 300

log_interval = 50

max_epoch = 60
