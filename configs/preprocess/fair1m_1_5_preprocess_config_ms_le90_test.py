# Ported from the reference config zoo: configs/preprocess/fair1m_1_5_preprocess_config_ms_le90_test.py
# (hyperparameter data — values must match the reference
# recipe for parity; machine-specific dataset paths are
# rewritten to repo-relative datasets/ locations).
# Regenerate with tools/port_reference_configs.py.

angle_version = "le90"

convert_tasks = ["test"]

source_dataset_path = "./data/test_dota"

source_fair_dataset_path = "../data/testa-3"

target_dataset_path = "./data/test_ms"

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
        label="test",
    ),
]

type = "FAIR1M_1_5"
