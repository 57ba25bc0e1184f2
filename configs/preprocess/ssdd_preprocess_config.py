# Ported from the reference config zoo: configs/preprocess/ssdd_preprocess_config.py
# (hyperparameter data — values must match the reference
# recipe for parity; machine-specific dataset paths are
# rewritten to repo-relative datasets/ locations).
# Regenerate with tools/port_reference_configs.py.

convert_tasks = ["test", "train"]

resize = 800

source_dataset_path = "datasets/Official-SSDD-OPEN/BBox_SSDD/voc_style"

target_dataset_path = "datasets/processed_SSDD"

type = "SSDD"
