"""Driver-facing entry-point contract smokes.

The round driver consumes three artifacts: ``__graft_entry__.entry()``
(single-chip compile check), ``__graft_entry__.dryrun_multichip(n)``
(virtual-mesh training-step dry run), and ``bench.py``'s default-mode
JSON line (the headline perf record). The sparse/scene bench modes
already have smokes (test_bench_sparse.py); these tests pin the
remaining surfaces cheaply — import, signature, flagship config, the
anchor-matched dryrun GTs, and the default bench record schema — so a
refactor cannot silently break the round artifacts that only the
driver would otherwise exercise.
"""

import inspect
import json
import os
import subprocess
import sys

import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_graft_entry_surface():
    sys.path.insert(0, _REPO)
    import __graft_entry__ as ge

    # driver calls dryrun_multichip(n_devices) positionally
    assert list(inspect.signature(ge.dryrun_multichip).parameters) \
        == ["n_devices"]
    # entry() takes no args; not invoked here (it inits the full
    # VAN-b3 at 1024^2 — the driver runs that on the real chip)
    assert list(inspect.signature(ge.entry).parameters) == []

    # flagship is the competition config (orcnn_van3_7_anchor_swa_1):
    # VAN-b3 depths + the 7-ratio RPN anchor set
    model = ge._flagship(tiny=False)
    assert tuple(model.backbone.depths) == (3, 5, 27, 3)
    assert len(model.rpn.anchor_generator["ratios"]) == 7

    # the dryrun GTs must keep matching anchors so the mesh step
    # exercises the regression-gradient path (VERDICT-r3 #5: with
    # unmatched GTs every bbox loss was exactly 0.0 and the coder /
    # RoIAlign-backward / grad-psum path went unproven)
    t = ge._dummy_targets(2, 64)
    assert t["rboxes"].shape == (2, 8, 5)
    assert bool(t["gt_mask"][:, :2].all())
    assert float(t["rboxes"][0, 0, 2]) > 16.0  # anchor-scale, not tiny


@pytest.mark.slow
def test_bench_tiny_default_smoke():
    """Default-mode bench contract: one parseable JSON line with the
    metric/value/unit/vs_baseline schema the driver records."""
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [sys.executable, os.path.join(_REPO, "bench.py"), "--tiny",
         "--iters", "2", "--warmup", "1"],
        capture_output=True, text=True, timeout=900, env=env, cwd=_REPO)
    assert r.returncode == 0, r.stderr[-2000:]
    lines = [l for l in r.stdout.strip().splitlines()
             if l.startswith("{")]
    assert len(lines) == 1, r.stdout
    rec = json.loads(lines[0])
    assert rec["metric"] == "orcnn_tiny_smoke_infer"
    assert rec["unit"] == "tiles/sec/chip"
    assert rec["value"] > 0
    assert 0 < rec["vs_baseline"] < 1
