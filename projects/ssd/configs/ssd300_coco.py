model = dict(
    type="SSD",
    backbone=dict(type="SSDVGG"),
    neck=dict(type="SSDNeck"),
    bbox_head=dict(type="SSDHead", num_classes=81),
)

dataset = dict(
    train=dict(type="COCODataset",
               dataset_dir="datasets/coco",
               batch_size=8, shuffle=True),
    val=dict(type="COCODataset", dataset_dir="datasets/coco",
             batch_size=8),
)

optimizer = dict(type="SGD", lr=2e-3, momentum=0.9, weight_decay=5e-4)
scheduler = dict(type="StepLR", warmup="linear", warmup_iters=500,
                 warmup_ratio=1.0 / 3, milestones=[16, 22])
max_epoch = 24
log_interval = 50
checkpoint_interval = 1
