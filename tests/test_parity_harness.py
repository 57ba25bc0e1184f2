"""Checkpoint-parity harness (tools/parity_check.py, VERDICT #5):
reference-style checkpoint -> name remap -> layout convert -> shape
audit -> inference -> detection diff, proven by round-trip."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__))), "tools"))


def test_remap_reference_names():
    import parity_check as pc

    state = {
        "backbone.block1.0.attn.spatial_gating_unit.conv0.weight":
            np.zeros((16, 1, 5, 5)),
        "backbone.block1.0.mlp.dwconv.dwconv.bias": np.zeros(16),
        "backbone.norm1.weight": np.zeros(16),          # BN (has stats)
        "backbone.norm1.running_mean": np.zeros(16),
        "bbox_head.shared_fcs.0.weight": np.zeros((64, 784)),
        "backbone.layer1.0.downsample.0.weight":
            np.zeros((64, 64, 1, 1)),
        "backbone.layer1.0.downsample.1.running_var": np.zeros(64),
    }
    out = pc.remap_reference_names(state)
    assert "backbone.block1_0.attn.sgu.conv0.weight" in out
    assert "backbone.block1_0.mlp.dwconv.bias" in out
    assert "backbone.norm1.BatchNorm_0.weight" in out
    assert "backbone.norm1.BatchNorm_0.running_mean" in out
    assert "bbox_head.shared_fc0.weight" in out
    assert "backbone.layer1.0.downsample_conv.weight" in out
    assert "backbone.layer1.0.downsample_bn.running_var" in out


def test_audit_reports_all_mismatches():
    import parity_check as pc

    got = {"a": {"kernel": np.zeros((3, 4))}, "x": np.zeros(2)}
    want = {"a": {"kernel": np.zeros((4, 4))}, "y": np.zeros(2)}
    problems = pc.audit(got, want, "params")
    text = "\n".join(problems)
    assert "SHAPE" in text and "EXTRA" in text and "MISSING" in text
    assert len(problems) == 3


@pytest.mark.slow
def test_parity_selftest_round_trip():
    """The full loop: export the tiny flagship in reference style,
    reload through remap+convert+audit, detections identical."""
    import parity_check as pc

    pc.selftest()
