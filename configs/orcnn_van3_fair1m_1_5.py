# Oriented R-CNN + VAN-b3 competition config — mirrors the reference
# configs/orcnn_van3_7_anchor_swa_1.py recipe (AdamW 1e-4, 9 epochs
# step@8, SWA from epoch 8, flip + ra90 aug, FAIR1M-1.5 10 classes).

num_classes = 10

model = dict(
    type="OrientedRCNN",
    backbone=dict(type="van_b3", pretrained=True),
    neck=dict(type="FPN",
              in_channels=[64, 128, 320, 512],
              out_channels=256,
              num_outs=5),
    rpn=dict(
        type="OrientedRPNHead",
        in_channels=256,
        num_classes=1,
        anchor_generator=dict(
            type="AnchorGenerator",
            scales=[8],
            ratios=[0.125, 0.25, 0.5, 1.0, 2.0, 4.0, 8.0],
            strides=[4, 8, 16, 32, 64]),
        bbox_coder=dict(
            type="MidpointOffsetCoder",
            target_means=[0.0] * 6,
            target_stds=[1.0, 1.0, 1.0, 1.0, 0.5, 0.5]),
        assigner=dict(type="MaxIoUAssigner", pos_iou_thr=0.7,
                      neg_iou_thr=0.3, min_pos_iou=0.3,
                      match_low_quality=True),
        sampler=dict(type="RandomSampler", num=256, pos_fraction=0.5),
        nms_pre=2000, nms_post=2000, nms_thresh=0.8),
    bbox_head=dict(
        type="OrientedHead",
        num_classes=num_classes,
        in_channels=256,
        assigner=dict(type="MaxIoUAssigner", pos_iou_thr=0.5,
                      neg_iou_thr=0.5, min_pos_iou=0.5,
                      match_low_quality=False,
                      iou_calculator=dict(
                          type="BboxOverlaps2D_rotated_v1")),
        sampler=dict(type="RandomSamplerRotated", num=512,
                     pos_fraction=0.25, add_gt_as_proposals=True),
        bbox_coder=dict(type="OrientedDeltaXYWHTCoder",
                        target_means=[0.0] * 5,
                        target_stds=[0.1, 0.1, 0.2, 0.2, 0.1]),
        bbox_roi_extractor=dict(
            type="OrientedSingleRoIExtractor",
            roi_layer=dict(type="ROIAlignRotated_v1", output_size=7,
                           sampling_ratio=2),
            out_channels=256,
            extend_factor=(1.4, 1.2),
            featmap_strides=[4, 8, 16, 32]),
        score_thresh=0.05),
)

_norm = dict(type="Normalize",
             mean=[123.675, 116.28, 103.53],
             std=[58.395, 57.12, 57.375], to_bgr=False)

dataset = dict(
    train=dict(
        type="FAIR1M_1_5_Dataset",
        dataset_dir="datasets/fair1m_1_5/trainval_1024_200_0.5-1.0-1.5",
        transforms=[
            dict(type="RotatedResize", min_size=1024, max_size=1024),
            dict(type="RotatedRandomFlip", prob=0.5),
            dict(type="RandomRotateAug", random_rotate_on=True),
            dict(type="Pad", size_divisor=32),
            _norm,
        ],
        batch_size=8,
        num_workers=8,
        shuffle=True,
        filter_empty_gt=False,
    ),
    val=dict(
        type="FAIR1M_1_5_Dataset",
        dataset_dir="datasets/fair1m_1_5/trainval_1024_200_0.5-1.0-1.5",
        transforms=[
            dict(type="RotatedResize", min_size=1024, max_size=1024),
            dict(type="Pad", size_divisor=32),
            _norm,
        ],
        batch_size=8,
    ),
    test=dict(
        type="ImageDataset",
        images_dir="datasets/fair1m_1_5/test_1024_200_0.5-1.0-1.5/images",
        dataset_type="FAIR1M_1_5",
        transforms=[
            dict(type="RotatedResize", min_size=1024, max_size=1024),
            dict(type="Pad", size_divisor=32),
            _norm,
        ],
        batch_size=1,
    ),
)

optimizer = dict(type="AdamW", lr=0.0001, weight_decay=0.05)
scheduler = dict(type="StepLR", warmup="linear", warmup_iters=500,
                 warmup_ratio=1.0 / 3, milestones=[7, 10])

optimizer_swa = dict(type="AdamW", lr=0.0001, weight_decay=0.05)
scheduler_swa = dict(type="CosineAnnealingLR", max_steps=1,
                     min_lr_ratio=0.01)
swa_start_epoch = 8

max_epoch = 9
log_interval = 50
checkpoint_interval = 1
merge_nms_threshold_type = 1
flip_test = True
