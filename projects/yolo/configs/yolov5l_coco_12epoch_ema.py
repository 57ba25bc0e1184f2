# Ported from the reference config zoo: projects/yolo/configs/yolov5l_coco_12epoch_ema.py
# (hyperparameter data — values must match the reference
# recipe for parity; machine-specific dataset paths are
# rewritten to repo-relative datasets/ locations).
# Regenerate with tools/port_reference_configs.py.

model = dict(
    type="YOLOv5L",
    anchor_t=4.0,
    boxlg=0.05,
    ch=3,
    cls_pw=1.0,
    clslg=0.5,
    ema=True,
    fl_gamma=0.0,
    imgsz=640,
    nc=80,
    obj_pw=1.0,
    objlg=1.0,
)

dataset = dict(
    test=dict(
        type="YoloDataset",
        batch_size=16,
        imgsz=640,
        num_workers=8,
        path="datasets/coco/val2017.txt",
        stride=32,
        task="test",
    ),
    train=dict(
        type="YoloDataset",
        augment=True,
        augment_hsv=dict(
            type="YoloAugmentHSV",
            hgain=0.015,
            sgain=0.7,
            vgain=0.4,
        ),
        batch_size=16,
        fliplr=dict(
            type="YoloRandomFlip",
            direction="horizontal",
            prob=0.5,
        ),
        flipud=dict(
            type="YoloRandomFlip",
            direction="vertical",
            prob=0.0,
        ),
        imgsz=640,
        num_workers=8,
        path="datasets/coco/train2017.txt",
        random_perspective=dict(
            type="YoloRandomPerspective",
            degrees=0.0,
            perspective=0.0,
            scale=0.5,
            shear=0.0,
            translate=0.1,
        ),
        stride=32,
        task="train",
    ),
    val=dict(
        type="YoloDataset",
        batch_size=16,
        imgsz=640,
        num_workers=8,
        path="datasets/coco/val2017.txt",
        stride=32,
        task="val",
    ),
)

optimizer = dict(
    type="SGD",
    lr=0.01,
    momentum=0.937,
    nesterov=True,
)

scheduler = dict(
    type="CosineAnnealingLRGroup",
    max_steps=12,
    min_lr_ratio=0.2,
    warmup="linear",
    warmup_init_lr_pg=[0.0, 0.0, 0.1],
    warmup_initial_momentum=0.8,
    warmup_iters=22179,
    warmup_ratio=0.0,
)

parameter_groups_generator = dict(
    type="YoloParameterGroupsGenerator",
    batch_size=16,
    weight_decay=0.0005,
)

logger = dict(
    type="RunLogger",
)

batch_size = 16

checkpoint_interval = 4

dataset_type = "YoloDataset"

eval_interval = 13

imgsz = 640

imgsz_test = 640

log_interval = 10

max_epoch = 12

stride = 32
