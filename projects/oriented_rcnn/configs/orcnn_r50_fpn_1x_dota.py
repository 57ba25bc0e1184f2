# Oriented R-CNN R50-FPN 1x DOTA1.0 (reference mAP 75.62,
# JDet_README.md:110): 1024/200 tiles, flip aug, SGD 1x schedule.
num_classes = 15

model = dict(
    type="OrientedRCNN",
    backbone=dict(type="ResNet", depth=50, frozen_stages=1,
                  norm_eval=True, pretrained=True),
    neck=dict(type="FPN", in_channels=[256, 512, 1024, 2048],
              out_channels=256, num_outs=5),
    rpn=dict(
        type="OrientedRPNHead",
        in_channels=256,
        anchor_generator=dict(type="AnchorGenerator", scales=[8],
                              ratios=[0.5, 1.0, 2.0],
                              strides=[4, 8, 16, 32, 64]),
        assigner=dict(type="MaxIoUAssigner", pos_iou_thr=0.7,
                      neg_iou_thr=0.3, min_pos_iou=0.3,
                      match_low_quality=True),
        sampler=dict(type="RandomSampler", num=256, pos_fraction=0.5),
        nms_pre=2000, nms_post=2000, nms_thresh=0.8),
    bbox_head=dict(
        type="OrientedHead", num_classes=num_classes, in_channels=256,
        assigner=dict(type="MaxIoUAssigner", pos_iou_thr=0.5,
                      neg_iou_thr=0.5, min_pos_iou=0.5,
                      match_low_quality=False,
                      iou_calculator=dict(
                          type="BboxOverlaps2D_rotated_v1")),
        sampler=dict(type="RandomSampler", num=512, pos_fraction=0.25,
                     add_gt_as_proposals=True)))

dataset = dict(
    train=dict(
        type="DOTADataset", version="1",
        dataset_dir="data/dota/trainval_1024_200_1.0",
        transforms=[
            dict(type="RotatedResize", min_size=1024, max_size=1024),
            dict(type="RotatedRandomFlip", prob=0.5),
            dict(type="Pad", size_divisor=32),
            dict(type="Normalize", mean=[123.675, 116.28, 103.53],
                 std=[58.395, 57.12, 57.375], to_bgr=False),
        ],
        batch_size=2, num_workers=4, shuffle=True),
    test=dict(
        type="ImageDataset", dataset_type="DOTA",
        images_dir="data/dota/test_1024_200_1.0/images",
        transforms=[
            dict(type="RotatedResize", min_size=1024, max_size=1024),
            dict(type="Pad", size_divisor=32),
            dict(type="Normalize", mean=[123.675, 116.28, 103.53],
                 std=[58.395, 57.12, 57.375], to_bgr=False),
        ],
        batch_size=2, num_workers=4))

optimizer = dict(type="SGD", lr=0.005, momentum=0.9, weight_decay=1e-4,
                 grad_clip=dict(max_norm=35, norm_type=2))
scheduler = dict(type="StepLR", warmup="linear", warmup_iters=500,
                 warmup_ratio=1.0 / 3.0, milestones=[8, 11])

max_epoch = 12
eval_interval = 12
checkpoint_interval = 4
log_interval = 50
