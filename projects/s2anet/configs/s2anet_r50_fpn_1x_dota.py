_base_ = "../../../configs/s2anet_r50_fpn_1x_dota.py"
