"""On-TPU overfit-to-mAP proof: the full Runner loop on real hardware.

Runs the same train-to-detect evidence as
``tests/test_map_pipeline.py`` (rendered rotated-rectangle tiles ->
Runner.train -> Runner.val AP -> Runner.test tile pipeline ->
result-merge scene match) but ON THE REAL TPU instead of the tests'
forced-CPU backend — the strongest available accuracy evidence without
labeled aerial data (no egress): it exercises device compile, the
Pallas kernels' real-hardware numerics (RoIAlign fwd+bwd now default
in training), the DP train step, and the host merge devkits in one
loop.

Appends a JSON record to work_dirs/round3_tpu.jsonl.

    python tools/analysis_tools/tpu_overfit_proof.py [--iters 400]
"""

from __future__ import annotations

import argparse
import json
import math
import os
import pickle
import shutil
import sys
import tempfile
import time

REPO = os.path.abspath(os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "..", ".."))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=400)
    ap.add_argument("--lr", type=float, default=0.001)
    args = ap.parse_args()

    import numpy as np

    import rs_detection_tpu.data  # noqa: F401
    import rs_detection_tpu.models  # noqa: F401
    from rs_detection_tpu.config import get_cfg
    from rs_detection_tpu.config.constant import DOTA1_CLASSES
    from rs_detection_tpu.runner.runner import Runner
    from test_map_pipeline import render_dataset
    from test_runner import _tiny_cfg

    import jax
    backend = jax.default_backend()
    print(f"backend: {backend} {jax.devices()}", flush=True)

    work = tempfile.mkdtemp(prefix="tpu_overfit_")
    os.chdir(work)
    ds_dir = render_dataset(os.path.join(work, "ds"))
    tiles = os.path.join(work, "tiles", "images")
    os.makedirs(tiles)
    offsets = {0: (0, 0), 1: (128, 0), 2: (0, 128), 3: (128, 128)}
    for i, (ox, oy) in offsets.items():
        shutil.copy(os.path.join(ds_dir, "images", f"tile_{i}.png"),
                    os.path.join(tiles, f"S0001__1.0__{ox}___{oy}.png"))

    cfg = get_cfg()
    cfg.clear()
    c = _tiny_cfg(ds_dir, os.path.join(work, "w"), max_iter=None)
    c["max_epoch"] = args.iters // 2 + 1
    c["optimizer"]["lr"] = args.lr
    c["scheduler"] = dict(type="StepLR", warmup="linear",
                          warmup_iters=10, warmup_ratio=0.1,
                          milestones=[args.iters * 3 // 4 // 2])
    c["dataset"]["val"] = dict(c["dataset"]["train"])
    c["dataset"]["test"] = dict(
        type="ImageDataset", images_dir=tiles, dataset_type="DOTA",
        batch_size=2, transforms=list(c["dataset"]["train"]["transforms"]))
    c["merge_cfg"] = dict(dataset_type="DOTA")
    c["eval_interval"] = 9999
    c["checkpoint_interval"] = 9999
    c["log_interval"] = 100
    cfg.update(c)

    runner = Runner()
    t0 = time.time()
    for it in range(args.iters // 2):
        runner.train()
    train_s = time.time() - t0
    aps = runner.val()
    ap_vals = {k: float(v) for k, v in aps.items()
               if k.startswith("eval/")}
    print("APs:", ap_vals, flush=True)

    runner.test(flip_test=False)
    merged_dir = os.path.join(
        os.path.join(work, "w"), f"test/submit_{runner.epoch}/after_nms")
    dets = {}
    for cls_id in (1, 2):
        path = os.path.join(merged_dir,
                            DOTA1_CLASSES[cls_id - 1] + ".txt")
        if not os.path.exists(path):
            continue
        for line in open(path):
            f = line.split()
            if f[0] != "S0001":
                continue
            poly = np.asarray([float(v) for v in f[2:10]])
            dets.setdefault(cls_id, []).append(
                (float(f[1]), poly[0::2].mean(), poly[1::2].mean()))

    with open(os.path.join(ds_dir, "labels.pkl"), "rb") as fh:
        infos = pickle.load(fh)
    matched = total = 0
    for i, info in enumerate(infos):
        ox, oy = offsets[i]
        for box, lab in zip(info["ann"]["bboxes"],
                            info["ann"]["labels"]):
            total += 1
            gx, gy = box[0] + ox, box[1] + oy
            ok = any(abs(cx - gx) < 24 and abs(cy - gy) < 24
                     and s >= 0.1
                     for s, cx, cy in dets.get(int(lab), []))
            matched += bool(ok)

    # only classes 1/2 are rendered; the pass criterion is the
    # test_map_pipeline one: every PRESENT class AP >= 0.3 + the
    # scene-merge match (15-class meanAP would dilute by absent
    # classes)
    present = [v for k, v in ap_vals.items()
               if k.startswith("eval/1_") or k.startswith("eval/2_")]
    rec = {"step": "tpu_overfit_proof", "backend": backend,
           "iters": args.iters, "train_wall_s": round(train_s, 1),
           "present_class_aps": present,
           "aps": ap_vals, "scene_matched": matched,
           "scene_total": total,
           "ok": (len(present) == 2
                  and all(v >= 0.3 for v in present)
                  and matched >= total * 0.4),
           "t": time.strftime("%Y-%m-%dT%H:%M:%S")}
    out = os.path.join(REPO, "work_dirs", "round3_tpu.jsonl")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print("RECORD", json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
