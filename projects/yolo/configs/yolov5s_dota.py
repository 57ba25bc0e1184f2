model = dict(
    type="YOLO",
    backbone=dict(type="CSPDarknet"),
    neck=dict(type="YOLOPAN"),
    bbox_head=dict(type="YOLOv5Head", num_classes=15),
)

dataset = dict(
    train=dict(type="YoloDataset", dataset_dir="datasets/dota_yolo",
               img_size=1024, batch_size=8),
)

optimizer = dict(type="SGD", lr=0.01, momentum=0.937,
                 weight_decay=5e-4)
scheduler = dict(type="CosineAnnealingLR", warmup="linear",
                 warmup_iters=1000, warmup_ratio=0.1)
max_epoch = 300
log_interval = 50
checkpoint_interval = 10
