# DOTA trainval tiling config — mirrors the reference preprocess recipe
# (1024 tiles, 200 gap, single scale).
type = "DOTA"
source_dataset_path = "datasets/DOTA"
target_dataset_path = "datasets/DOTA_processed"
convert_type = "DOTA"
angle_version = "le135"
tasks = [
    dict(label="trainval", config=dict(subsize=1024, gap=200,
                                       rates=[1.0], num_process=8)),
    dict(label="test", config=dict(subsize=1024, gap=200,
                                   rates=[1.0], num_process=8)),
]
