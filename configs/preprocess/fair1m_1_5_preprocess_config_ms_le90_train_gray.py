# Ported from the reference config zoo: configs/preprocess/fair1m_1_5_preprocess_config_ms_le90_train_gray.py
# (hyperparameter data — values must match the reference
# recipe for parity; machine-specific dataset paths are
# rewritten to repo-relative datasets/ locations).
# Regenerate with tools/port_reference_configs.py.

angle_version = "le90"

convert_tasks = ["train"]

source_dataset_path = "datasets/data/private/LYX/data/FAIR1M2.0_dota"

source_fair_dataset_path = "datasets/data/private/LYX/data/testa-3sdfs"

target_dataset_path = "datasets/data/private/LYX/data/FAIR1M2.0_ms"

tasks = [
    dict(
        config=dict(
            horizontal_flip=False,
            multi_scale=[
                0.25,
                0.4,
                0.5,
                0.7,
                0.8,
                0.9,
                1,
                1.2,
                1.4,
                1.5,
                1.6,
                1.8,
                2.0,
            ],
            overlap_size=200,
            rotation_angles=[0.0],
            subimage_size=1024,
            vertical_flip=False,
        ),
        label="train",
    ),
]

type = "FAIR1M_1_5"
