"""Round-3 follow-up TPU batch: dw tap-backward A/B + loss equality.

Same-window continuation of round3_tpu_session.py (chip drifts ~8%
run-to-run; the 586.1/531.2 train baselines were just measured):

  1. train b8 with RS_DW_TAP_BWD=1           [vs 586.1 XLA baseline]
  2. train b8 with RS_DW_TAP_BWD=1 + RS_ROI_TRAIN_PALLAS=1 [combined]
  3. loss-equality: one train step per flag combo, losses must agree
     to bf16 tolerance (guards the default flip)

Appends JSON lines to work_dirs/round3_tpu.jsonl.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.abspath(os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "..", ".."))
OUT = os.path.join(REPO, "work_dirs", "round3_tpu.jsonl")

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from round3_tpu_session import record, run  # noqa: E402


LOSS_CHECK = r"""
import json, os, sys
import jax, jax.numpy as jnp, numpy as np
sys.path.insert(0, ".")
from __graft_entry__ import _dummy_targets, _flagship
from rs_detection_tpu.optims.optimizer import AdamW
from rs_detection_tpu.parallel.train_step import (create_train_state,
                                                  make_train_step)
import dataclasses
model = _flagship(tiny=False)
model = dataclasses.replace(model, compute_dtype=jnp.bfloat16)
b, img = 8, 1024
rng = np.random.RandomState(0)
images = jnp.asarray(rng.rand(b, img, img, 3).astype(np.float32))
targets = _dummy_targets(b, img)
variables = jax.jit(lambda i, t: model.init(
    {"params": jax.random.PRNGKey(0),
     "sampler": jax.random.PRNGKey(1)}, i, t))(images, targets)
tx = AdamW(lr=1e-4, weight_decay=0.05, grad_clip=dict(max_norm=35))
state = create_train_state(model, variables, tx)
step = make_train_step(model, tx, mesh=None)
_, metrics = step(state, images, targets, jax.random.PRNGKey(2))
out = {k: float(v) for k, v in metrics.items()}
print("LOSSES " + json.dumps(out), flush=True)
"""


def loss_check(name, env):
    r = run(name, [sys.executable, "-c", LOSS_CHECK], env=env,
            timeout=5400, parse=r"LOSSES .*?\"total_loss\": ([0-9.eE+-]+)")
    return r


def main():
    py = sys.executable
    tb = [py, "tools/analysis_tools/train_step_bench.py",
          "--batch", "8", "--iters", "6"]
    pat = r"([0-9.]+)\s*ms/iter"

    a = run("train_b8_dwtap", tb, env={"RS_DW_TAP_BWD": "1"},
            parse=pat, timeout=7200)
    b = run("train_b8_dwtap_pallas_roi", tb,
            env={"RS_DW_TAP_BWD": "1", "RS_ROI_TRAIN_PALLAS": "1"},
            parse=pat, timeout=7200)
    if a and a.get("value"):
        record({"step": "dwtap_delta", "ms_xla": 586.1,
                "ms_dwtap": a["value"],
                "speedup": round(586.1 / a["value"], 4)})
    if b and b.get("value"):
        record({"step": "combined_delta", "ms_base": 586.1,
                "ms_combined": b["value"],
                "speedup": round(586.1 / b["value"], 4)})

    # loss equality across flag combos (programs now all cached)
    base = loss_check("loss_base", {})
    for name, env in [
            ("loss_dwtap", {"RS_DW_TAP_BWD": "1"}),
            ("loss_pallas_roi", {"RS_ROI_TRAIN_PALLAS": "1"}),
            ("loss_combined", {"RS_DW_TAP_BWD": "1",
                               "RS_ROI_TRAIN_PALLAS": "1"})]:
        r = loss_check(name, env)
        if base and r and base.get("value") and r.get("value"):
            rel = abs(r["value"] - base["value"]) / max(
                abs(base["value"]), 1e-9)
            record({"step": name + "_vs_base", "rel_err": round(rel, 6),
                    "ok": rel < 0.02})

    print("followup done", flush=True)


if __name__ == "__main__":
    main()
