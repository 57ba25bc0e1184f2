# Ported from the reference config zoo: configs/preprocess/fair1m_1_5_preprocess_config_ms_le90.py
# (hyperparameter data — values must match the reference
# recipe for parity; machine-specific dataset paths are
# rewritten to repo-relative datasets/ locations).
# Regenerate with tools/port_reference_configs.py.

angle_version = "le90"

convert_tasks = ["train", "test"]

source_dataset_path = "datasets/Detection/dota_ms"

source_fair_dataset_path = "datasets/Detection/data"

target_dataset_path = "datasets/Detection/preprocessed_ms_le90"

tasks = [
    dict(
        config=dict(
            horizontal_flip=False,
            multi_scale=[0.5, 1.0, 1.5],
            overlap_size=200,
            rotation_angles=[0.0],
            subimage_size=1024,
            vertical_flip=False,
        ),
        label="train",
    ),
    dict(
        config=dict(
            horizontal_flip=False,
            multi_scale=[0.5, 1.0, 1.5],
            overlap_size=200,
            rotation_angles=[0.0],
            subimage_size=1024,
            vertical_flip=False,
        ),
        label="test",
    ),
]

type = "FAIR1M_1_5"
