# Ported from the reference config zoo: projects/yolo/configs/yolo_scheduler_base.py
# (hyperparameter data — values must match the reference
# recipe for parity; machine-specific dataset paths are
# rewritten to repo-relative datasets/ locations).
# Regenerate with tools/port_reference_configs.py.

scheduler = dict(
    type="CosineAnnealingLRGroup",
    min_lr_ratio=0.2,
    warmup="linear",
    warmup_init_lr_pg=[0.0, 0.0, 0.1],
    warmup_initial_momentum=0.8,
    warmup_iters=1000,
    warmup_ratio=0.0,
)
