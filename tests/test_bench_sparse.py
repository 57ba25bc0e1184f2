"""bench.py --scene-sparse smoke (tiny CPU mode).

Pins the sparse-scene screened serving bench contract: one JSON line
with the effective-throughput metric plus the audit fields (measured
occupancy, screen recalls, dense/thresh/budget rates). The tiny mode
runs the small flagship on CPU; the real-TPU numbers are recorded in
docs/perf_notes.md / BENCH files.
"""

import json
import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_scene_sparse_tiny_smoke():
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [sys.executable, os.path.join(_REPO, "bench.py"), "--tiny",
         "--scene-sparse", "25", "--iters", "2"],
        capture_output=True, text=True, timeout=1800, env=env,
        cwd=_REPO)
    assert r.returncode == 0, r.stderr[-2000:]
    line = [l for l in r.stdout.strip().splitlines()
            if l.startswith("{")][-1]
    rec = json.loads(line)
    assert rec["metric"] == "orcnn_tiny_scene_sparse_smoke"
    assert rec["unit"] == "effective_tiles/sec/chip"
    for key in ("occupancy_measured", "recall_budget", "recall_thresh",
                "dense_tiles_per_sec", "thresh_tiles_per_sec",
                "speedup_budget_vs_dense"):
        assert key in rec, key
    assert rec["value"] > 0
    # screening must not be slower than running every tile
    assert rec["speedup_budget_vs_dense"] > 1.0
    # the trained screen separates the rendered task
    assert rec["recall_thresh"] >= 0.9
