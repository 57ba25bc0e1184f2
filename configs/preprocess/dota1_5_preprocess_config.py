# Ported from the reference config zoo: configs/preprocess/dota1_5_preprocess_config.py
# (hyperparameter data — values must match the reference
# recipe for parity; machine-specific dataset paths are
# rewritten to repo-relative datasets/ locations).
# Regenerate with tools/port_reference_configs.py.

source_dataset_path = "datasets/DOTA1_5"

target_dataset_path = "datasets/processed_DOTA1_5"

tasks = [
    dict(
        config=dict(
            horizontal_flip=False,
            multi_scale=[1.0],
            overlap_size=150,
            rotation_angles=[0.0],
            subimage_size=600,
            vertical_flip=False,
        ),
        label="trainval",
    ),
    dict(
        config=dict(
            horizontal_flip=False,
            multi_scale=[1.0],
            overlap_size=150,
            rotation_angles=[0.0],
            subimage_size=600,
            vertical_flip=False,
        ),
        label="test",
    ),
]

type = "DOTA1_5"
