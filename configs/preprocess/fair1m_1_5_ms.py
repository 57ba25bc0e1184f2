# FAIR1M-1.5 multi-scale tiling — mirrors the competition preprocess
# (configs/preprocess/fair1m_1_5_preprocess_config_ms_le90_*: 1024/200,
# scales 0.5/1.0/1.5, le90 angles, FAIR1M2->10-class mapping).
type = "FAIR"
source_dataset_path = "datasets/fair1m_2"
target_dataset_path = "datasets/fair1m_1_5_processed"
convert_type = "FAIR1M_1_5"
angle_version = "le90"
fair1m_mapping = True
tasks = [
    dict(label="trainval", config=dict(subsize=1024, gap=200,
                                       rates=[0.5, 1.0, 1.5],
                                       num_process=8)),
    dict(label="test", config=dict(subsize=1024, gap=200,
                                   rates=[0.5, 1.0, 1.5],
                                   num_process=8)),
]
