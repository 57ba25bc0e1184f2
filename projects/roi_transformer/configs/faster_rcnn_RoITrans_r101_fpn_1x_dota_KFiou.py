# Ported from the reference config zoo: projects/roi_transformer/configs/faster_rcnn_RoITrans_r101_fpn_1x_dota_KFiou.py
# (hyperparameter data — values must match the reference
# recipe for parity; machine-specific dataset paths are
# rewritten to repo-relative datasets/ locations).
# Regenerate with tools/port_reference_configs.py.

model = dict(
    type="RoITransformer",
    backbone=dict(
        type="Resnet101",
        frozen_stages=1,
        pretrained=True,
        return_stages=["layer1", "layer2", "layer3", "layer4"],
    ),
    bbox_head=dict(
        type="SharedFCBBoxHeadRbbox",
        fc_out_channels=1024,
        in_channels=256,
        loss_bbox=dict(
            type="SmoothL1Loss",
            beta=1.0,
            loss_weight=1.0,
        ),
        loss_cls=dict(
            type="CrossEntropyLossForRcnn",
            loss_weight=1.0,
            use_sigmoid=False,
        ),
        num_classes=10,
        num_fcs=2,
        reg_class_agnostic=True,
        roi_feat_size=7,
        target_means=[0.0, 0.0, 0.0, 0.0, 0.0],
        target_stds=[0.1, 0.1, 0.2, 0.2, 0.1],
        with_module=False,
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
    neck=dict(
        type="FPN",
        add_extra_convs=False,
        in_channels=[256, 512, 1024, 2048],
        num_outs=5,
        out_channels=256,
        start_level=0,
    ),
    pretrained="modelzoo://resnet101",
    rbbox_head=dict(
        type="KFIoUSharedFCBBoxHeadRbbox",
        fc_out_channels=1024,
        in_channels=256,
        loss_bbox=dict(
            type="GDLoss",
            fun="ln",
            loss_type="kfiou",
            loss_weight=0.5,
        ),
        loss_cls=dict(
            type="CrossEntropyLossForRcnn",
            loss_weight=1.0,
            use_sigmoid=False,
        ),
        num_classes=10,
        num_fcs=2,
        reg_class_agnostic=True,
        roi_feat_size=7,
        target_means=[0.0, 0.0, 0.0, 0.0, 0.0],
        target_stds=[0.05, 0.05, 0.1, 0.1, 0.05],
    ),
    rbbox_roi_extractor=dict(
        type="RboxSingleRoIExtractor",
        featmap_strides=[4, 8, 16, 32],
        out_channels=256,
        roi_layer=dict(
            type="ROIAlignRotated",
            output_size=7,
            sampling_ratio=2,
        ),
    ),
    rpn_head=dict(
        type="FasterrcnnHead",
        anchor_ratios=[0.5, 1.0, 2.0],
        anchor_scales=[8],
        anchor_strides=[4, 8, 16, 32, 64],
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
        target_means=[0.0, 0.0, 0.0, 0.0],
        target_stds=[1.0, 1.0, 1.0, 1.0],
    ),
    test_cfg=dict(
        rcnn=dict(
            max_per_img=2000,
            nms=dict(
                type="py_cpu_nms_poly_fast",
                iou_thr=0.1,
            ),
            score_thr=0.05,
        ),
        rpn=dict(
            max_num=2000,
            min_bbox_size=0,
            nms_across_levels=False,
            nms_post=2000,
            nms_pre=2000,
            nms_thr=0.7,
        ),
    ),
    train_cfg=dict(
        rcnn=[
            dict(
                assigner=dict(
                    type="MaxIoUAssigner",
                    ignore_iof_thr=-1,
                    iou_calculator=dict(
                        type="BboxOverlaps2D_v1",
                    ),
                    min_pos_iou=0.5,
                    neg_iou_thr=0.5,
                    pos_iou_thr=0.5,
                ),
                debug=False,
                pos_weight=-1,
                sampler=dict(
                    type="RandomSampler",
                    add_gt_as_proposals=True,
                    neg_pos_ub=-1,
                    num=512,
                    pos_fraction=0.25,
                ),
            ),
            dict(
                assigner=dict(
                    type="MaxIoUAssignerRbbox",
                    ignore_iof_thr=-1,
                    iou_calculator=dict(
                        type="BboxOverlaps2D_rotated",
                    ),
                    min_pos_iou=0.5,
                    neg_iou_thr=0.5,
                    pos_iou_thr=0.5,
                ),
                debug=False,
                pos_weight=-1,
                sampler=dict(
                    type="RandomSamplerRotated",
                    add_gt_as_proposals=True,
                    neg_pos_ub=-1,
                    num=512,
                    pos_fraction=0.25,
                ),
            ),
        ],
        rpn=dict(
            allowed_border=0,
            assigner=dict(
                type="MaxIoUAssigner",
                ignore_iof_thr=-1,
                iou_calculator=dict(
                    type="BboxOverlaps2D_v1",
                ),
                min_pos_iou=0.3,
                neg_iou_thr=0.3,
                pos_iou_thr=0.7,
            ),
            debug=False,
            pos_weight=-1,
            sampler=dict(
                type="RandomSampler",
                add_gt_as_proposals=False,
                neg_pos_ub=-1,
                num=256,
                pos_fraction=0.5,
            ),
        ),
        rpn_proposal=dict(
            max_num=2000,
            min_bbox_size=0,
            nms_across_levels=False,
            nms_post=2000,
            nms_pre=2000,
            nms_thr=0.7,
        ),
    ),
)

dataset = dict(
    test=dict(
        type="ImageDataset",
        batch_size=1,
        dataset_type="FAIR1M_1_5",
        images_dir="datasets/Detection/preprocessed_ms/test_1024_200_0.5-1.0-1.5/images",
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
        type="FAIR1M_1_5_Dataset",
        batch_size=8,
        dataset_dir="datasets/Detection/preprocessed_ms/train_1024_200_0.5-1.0-1.5",
        filter_empty_gt=False,
        num_workers=8,
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
        type="FAIR1M_1_5_Dataset",
        batch_size=8,
        dataset_dir="datasets/Detection/preprocessed_ms/train_1024_200_0.5-1.0-1.5",
        num_workers=8,
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

dataset_root = "datasets/Detection"

eval_interval = 2

log_interval = 20

max_epoch = 12
