# Ported from the reference config zoo: configs/preprocess/fair1m_2_preprocess_config_ms_le90_grok.py
# (hyperparameter data — values must match the reference
# recipe for parity; machine-specific dataset paths are
# rewritten to repo-relative datasets/ locations).
# Regenerate with tools/port_reference_configs.py.

angle_version = "le90"

convert_tasks = ["val"]

source_dataset_path = "datasets/dota_ms"

source_fair_dataset_path = "datasets/fair1m"

split_path = "data/fair1m/splits"

target_dataset_path = "datasets/preprocessed_ms_le90"

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
        fair1m2_aug=True,
        label="val",
        split="val1k",
    ),
]

type = "FAIR1M_1_5"
