"""Round-3 TPU measurement batch — fire when the tunnel is back.

Runs the round's pending measurements back-to-back in ONE window (the
chip drifts ~8% run-to-run; only same-window A/Bs are comparable —
docs/perf_notes.md methodology) and appends one JSON line each to
``work_dirs/round3_tpu.jsonl``:

  1. inference e2e baseline (bf16, fused kernels)        [bench.py]
  2. inference e2e with int8 serving (RS_INT8=1)         [A/B vs 1]
  3. int8 with the XLA MLP (RS_VAN_MLP_PALLAS=0)         [isolates
     the kernel-int8 contribution]
  4. raw-scene serving 2872^2 (pending since round 2)    [--scene]
  5. train step batch 8: XLA RoIAlign vs Pallas fwd+bwd
     (RS_ROI_TRAIN_PALLAS=0/1)                           [A/B]

Each step is bounded and failure-isolated: a crash or timeout writes
an {"error": ...} record and the session continues. Run it ONLY when
no other TPU process is active (single chip).

    python tools/analysis_tools/round3_tpu_session.py [--skip-train]
    [--quick]  (fewer iters; for a first validation pass)
"""

from __future__ import annotations

import argparse
import json
import os
import re
import subprocess
import sys
import time

REPO = os.path.abspath(os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "..", ".."))
OUT = os.path.join(REPO, "work_dirs", "round3_tpu.jsonl")


def record(entry):
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    entry["t"] = time.strftime("%Y-%m-%dT%H:%M:%S")
    with open(OUT, "a") as f:
        f.write(json.dumps(entry) + "\n")
    print("RECORD", json.dumps(entry), flush=True)


def run(name, cmd, env=None, timeout=5400, parse="json"):
    print(f"\n=== {name}: {' '.join(cmd)} (env {env})", flush=True)
    full_env = {**os.environ, **(env or {})}
    t0 = time.time()
    try:
        r = subprocess.run(cmd, cwd=REPO, env=full_env,
                           capture_output=True, text=True,
                           timeout=timeout)
    except subprocess.TimeoutExpired:
        record({"step": name, "error": "timeout", "timeout_s": timeout})
        return None
    dt = time.time() - t0
    sys.stderr.write(r.stderr[-3000:])
    if r.returncode != 0:
        record({"step": name, "error": f"rc{r.returncode}",
                "tail": r.stdout[-800:] + r.stderr[-800:]})
        return None
    rec = None
    if parse == "json":
        for line in reversed(r.stdout.strip().splitlines()):
            try:
                cand = json.loads(line)
                if isinstance(cand, dict):
                    rec = cand
                    break
            except ValueError:
                continue
    else:  # regex: first float after the pattern
        m = re.search(parse, r.stdout)
        rec = {"value": float(m.group(1))} if m else None
    if rec is None:
        record({"step": name, "error": "unparseable",
                "tail": r.stdout[-800:]})
        return None
    rec = {"step": name, "wall_s": round(dt, 1), **rec, "env": env or {}}
    record(rec)
    return rec


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip-train", action="store_true")
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args()

    py = sys.executable
    iters = "8" if args.quick else "20"
    bench = [py, "bench.py", "--no-supervise", "--iters", iters]

    # 1. baseline (this also lands the BENCH_LAST.json number via the
    #    normal supervised run at round end)
    base = run("infer_bf16", bench)

    # 2. int8 serving (same window A/B)
    q = run("infer_int8", bench, env={"RS_INT8": "1"})

    # 3. int8 with XLA MLP — isolates the kernel-int8 term
    run("infer_int8_xla_mlp", bench,
        env={"RS_INT8": "1", "RS_VAN_MLP_PALLAS": "0"})

    # 4. raw-scene serving, 2872^2 (4x4 grid = two full batches)
    run("scene_2872", [py, "bench.py", "--no-supervise", "--scene",
                       "--iters", iters])

    if base and q and base.get("value") and q.get("value"):
        record({"step": "int8_delta",
                "speedup": round(q["value"] / base["value"], 4)})

    if not args.skip_train:
        titers = "6" if args.quick else "10"
        tb = [py, "tools/analysis_tools/train_step_bench.py",
              "--batch", "8", "--iters", titers]
        pat = r"([0-9.]+)\s*ms/iter"
        a = run("train_b8_xla_roialign", tb, parse=pat, timeout=7200)
        b = run("train_b8_pallas_roialign", tb,
                env={"RS_ROI_TRAIN_PALLAS": "1"}, parse=pat,
                timeout=7200)
        if a and b and a.get("value") and b.get("value"):
            record({"step": "train_pallas_delta",
                    "ms_xla": a["value"], "ms_pallas": b["value"],
                    "speedup": round(a["value"] / b["value"], 4)})

    print(f"\nsession done -> {OUT}", flush=True)


if __name__ == "__main__":
    main()
