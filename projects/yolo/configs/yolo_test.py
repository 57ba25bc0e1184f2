# Ported from the reference config zoo: projects/yolo/configs/yolo_test.py
# (hyperparameter data — values must match the reference
# recipe for parity; machine-specific dataset paths are
# rewritten to repo-relative datasets/ locations).
# Regenerate with tools/port_reference_configs.py.

model = dict(
    type="YOLOv5S",
    anchor_t=4.0,
    boxlg=0.05,
    ch=3,
    cls_pw=1.0,
    clslg=0.5,
    ema=False,
    fl_gamma=0.0,
    imgsz=640,
    nc=80,
    obj_pw=1.0,
    objlg=1.0,
)

dataset = dict(
    test=dict(
        type="YoloDataset",
        task="test",
    ),
    train=dict(
        type="YoloDataset",
        augment=False,
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
        path="datasets/coco128/images/train2017",
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
    max_steps=300,
    min_lr_ratio=0.2,
    warmup="linear",
    warmup_init_lr_pg=[0.0, 0.0, 0.1],
    warmup_initial_momentum=0.8,
    warmup_iters=1000,
    warmup_ratio=0.0,
)

parameter_groups_generator = dict(
    type="YoloParameterGroupsGenerator",
    batch_size=16,
    weight_decay=0.0005,
)

batch_size = 16

dataset_type = "YoloDataset"

imgsz = 640

imgsz_test = 640

max_epoch = 300

nc = 80

pretrained_weights = "test_datas_yolo/test_yolo.pkl"

stride = 32

test_mode = True
