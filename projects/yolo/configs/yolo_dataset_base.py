# Ported from the reference config zoo: projects/yolo/configs/yolo_dataset_base.py
# (hyperparameter data — values must match the reference
# recipe for parity; machine-specific dataset paths are
# rewritten to repo-relative datasets/ locations).
# Regenerate with tools/port_reference_configs.py.

dataset = dict(
    test=dict(
        type="YoloDataset",
        task="test",
    ),
    train=dict(
        type="YoloDataset",
        augment_hsv=dict(
            type="YoloAugmentHSV",
            hgain=0.015,
            sgain=0.7,
            vgain=0.4,
        ),
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
        random_perspective=dict(
            type="YoloRandomPerspective",
            degrees=0.0,
            perspective=0.0,
            scale=0.5,
            shear=0.0,
            translate=0.1,
        ),
        task="train",
    ),
    val=dict(
        type="YoloDataset",
        task="val",
    ),
)

dataset_type = "YoloDataset"
