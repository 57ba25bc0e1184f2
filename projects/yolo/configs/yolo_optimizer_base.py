# Ported from the reference config zoo: projects/yolo/configs/yolo_optimizer_base.py
# (hyperparameter data — values must match the reference
# recipe for parity; machine-specific dataset paths are
# rewritten to repo-relative datasets/ locations).
# Regenerate with tools/port_reference_configs.py.

optimizer = dict(
    type="SGD",
    lr=0.01,
    momentum=0.937,
    nesterov=True,
)

parameter_groups_generator = dict(
    type="YoloParameterGroupsGenerator",
    weight_decay=0.0005,
)
