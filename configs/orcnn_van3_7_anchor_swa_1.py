# Competition model #1 (reference configs/orcnn_van3_7_anchor_swa_1.py):
# Oriented R-CNN + VAN-b3, 7-ratio anchors [1/8..8], AdamW 1e-4,
# 9 epochs step@8, SWA from epoch 8, flip + ra90 aug, FAIR1M-1.5.
_base_ = ["orcnn_van3_fair1m_1_5.py"]

merge_nms_threshold_type = 1
