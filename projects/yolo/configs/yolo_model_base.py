# Ported from the reference config zoo: projects/yolo/configs/yolo_model_base.py
# (hyperparameter data — values must match the reference
# recipe for parity; machine-specific dataset paths are
# rewritten to repo-relative datasets/ locations).
# Regenerate with tools/port_reference_configs.py.

model = dict(
    anchor_t=4.0,
    boxlg=0.05,
    ch=3,
    cls_pw=1.0,
    clslg=0.5,
    fl_gamma=0.0,
    nc=80,
    obj_pw=1.0,
    objlg=1.0,
)
