"""Dataset preprocessing driver: conversion + tiling + pkl generation.

Capability parity with the reference ``tools/preprocess.py:23-126``:
driven by a preprocess config with ``type`` (DOTA/FAIR/SSDD),
``source_dataset_path``, ``target_dataset_path``, ``tasks`` (train/val/
test with per-task ``config`` of subsize/gap/rates), ``convert_tasks``.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def run(cfg):
    from rs_detection_tpu.data.devkits.convert_data_to_mmdet import (
        convert_data_to_mmdet, convert_data_to_mmdet_mapping)
    from rs_detection_tpu.data.devkits.fair_to_dota import (fair_to_dota,
                                                            ssdd_to_dota)
    from rs_detection_tpu.data.devkits.img_split import process

    src = cfg.source_dataset_path
    tgt = cfg.target_dataset_path
    dtype = cfg.type or "DOTA"
    os.makedirs(tgt, exist_ok=True)

    for task in (cfg.tasks or []):
        label = task.get("label", "trainval")
        tcfg = task.get("config", {})
        task_src = os.path.join(src, label)
        if dtype == "FAIR":
            dota_dir = os.path.join(tgt, label + "_dota")
            if not os.path.exists(dota_dir):
                fair_to_dota(task_src, dota_dir)
            task_src = dota_dir
        elif dtype.startswith("SSDD"):
            dota_dir = os.path.join(tgt, label + "_dota")
            if not os.path.exists(dota_dir):
                ssdd_to_dota(task_src, dota_dir)
            task_src = dota_dir

        out = process(task_src, os.path.join(tgt, label),
                      gap=tcfg.get("gap", 200),
                      subsize=tcfg.get("subsize", 1024),
                      rates=tcfg.get("rates", [1.0]),
                      num_process=tcfg.get("num_process", 8),
                      # lateral key parity: the reference tiler reads
                      # cfg.yx_style (ImgSplit_multi_process.py:191)
                      yx_style=bool(cfg.yx_style or
                                    tcfg.get("yx_style", False)))
        if label != "test":
            convert = (convert_data_to_mmdet_mapping
                       if cfg.get("fair1m_mapping")
                       else convert_data_to_mmdet)
            convert(out, os.path.join(out, "labels.pkl"),
                    type=cfg.convert_type or "DOTA",
                    angle_version=cfg.angle_version or "le135")
        print("done:", out)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config-file", required=True)
    ap.add_argument("--set", dest="overrides", nargs="*", default=[],
                    help="key=value config overrides")
    args = ap.parse_args()
    from rs_detection_tpu.config import init_cfg

    cfg = init_cfg(args.config_file)
    for kv in args.overrides:
        k, v = kv.split("=", 1)
        cfg[k] = v
    run(cfg)


if __name__ == "__main__":
    main()
