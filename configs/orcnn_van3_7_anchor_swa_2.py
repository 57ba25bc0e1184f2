# Competition model #2 (reference configs/orcnn_van3_7_anchor_swa_2.py):
# identical to model #1 except the anchor ratio set — the ensemble
# pairs the two via hbb-NMS merging (merge.py, thresh 0.625).
_base_ = ["orcnn_van3_fair1m_1_5.py"]

model = dict(
    rpn=dict(
        anchor_generator=dict(
            scales=[8],
            ratios=[0.167, 0.25, 0.5, 1.0, 2.0, 4.0, 6.0],
            strides=[4, 8, 16, 32, 64]),
    ),
)

merge_nms_threshold_type = 1
