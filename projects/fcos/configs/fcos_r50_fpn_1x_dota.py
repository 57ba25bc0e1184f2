model = dict(
    type="FCOS",
    backbone=dict(type="Resnet50", frozen_stages=1,
                  return_stages=["layer1", "layer2", "layer3", "layer4"]),
    neck=dict(type="FPN", in_channels=[256, 512, 1024, 2048],
              out_channels=256, num_outs=5, add_extra_convs="on_input"),
    bbox_head=dict(type="FCOSHead", num_classes=16, in_channels=256),
)

dataset = dict(
    train=dict(
        type="DOTADataset",
        dataset_dir="datasets/DOTA_1024/trainval_split",
        transforms=[
            dict(type="RotatedResize", min_size=1024, max_size=1024),
            dict(type="RotatedRandomFlip", prob=0.5),
            dict(type="Pad", size_divisor=32),
            dict(type="Normalize",
                 mean=[123.675, 116.28, 103.53],
                 std=[58.395, 57.12, 57.375], to_bgr=True),
        ],
        batch_size=2, num_workers=4, shuffle=True,
        filter_empty_gt=False,
    ),
    val=dict(
        type="DOTADataset",
        dataset_dir="datasets/DOTA_1024/trainval_split",
        transforms=[
            dict(type="RotatedResize", min_size=1024, max_size=1024),
            dict(type="Pad", size_divisor=32),
            dict(type="Normalize",
                 mean=[123.675, 116.28, 103.53],
                 std=[58.395, 57.12, 57.375], to_bgr=True),
        ],
        batch_size=2,
    ),
    test=dict(
        type="ImageDataset",
        images_dir="datasets/DOTA_1024/test_split/images",
        dataset_type="DOTA",
        transforms=[
            dict(type="RotatedResize", min_size=1024, max_size=1024),
            dict(type="Pad", size_divisor=32),
            dict(type="Normalize",
                 mean=[123.675, 116.28, 103.53],
                 std=[58.395, 57.12, 57.375], to_bgr=True),
        ],
        batch_size=2,
    ),
)

optimizer = dict(type="SGD", lr=0.01, momentum=0.9, weight_decay=0.0001,
                 grad_clip=dict(max_norm=35, norm_type=2))
scheduler = dict(type="StepLR", warmup="linear", warmup_iters=500,
                 warmup_ratio=1.0 / 3, milestones=[8, 11])

max_epoch = 12
log_interval = 50
checkpoint_interval = 1
eval_interval = 12
