"""Offline FAIR1M-1.5 evaluation: submission CSV vs GT XML -> per-class AP.

Capability parity with the reference ``tools/val.py:15-275``: parse the
GT labelXml directory, parse a submission CSV, run the VOC-style
oriented AP per class, print the table + mean.
"""

import argparse
import os
import sys
import xml.etree.ElementTree as ET

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from rs_detection_tpu.config.constant import FAIR1M_1_5_CLASSES  # noqa: E402
from rs_detection_tpu.data.devkits.voc_eval import voc_eval_dota  # noqa: E402


def load_gt_xml_dir(xml_dir):
    """-> {img_id: [(classname, poly8, difficult)]}"""
    gt = {}
    for f in sorted(os.listdir(xml_dir)):
        if not f.endswith(".xml"):
            continue
        img_id = os.path.splitext(f)[0]
        objs = []
        tree = ET.parse(os.path.join(xml_dir, f))
        for obj in tree.getroot().iter("object"):
            name = (obj.findtext("possibleresult/name") or "").strip()
            name = name.replace(" ", "_")
            pts = []
            for pt in obj.iter("point"):
                x, y = (pt.text or "0,0").split(",")
                pts += [float(x), float(y)]
            if len(pts) >= 8:
                objs.append((name, np.asarray(pts[:8]), 0))
        gt[img_id] = objs
    return gt


def load_submission_csv(path):
    """-> {classname: [(img_id, score, poly8)]}"""
    dets = {}
    with open(path) as f:
        for line in f:
            parts = line.strip().split(",")
            if len(parts) < 11:
                continue
            img_id = os.path.splitext(parts[0])[0]
            cls = parts[1]
            score = float(parts[2])
            poly = np.asarray([float(v) for v in parts[3:11]])
            dets.setdefault(cls, []).append((img_id, score, poly))
    return dets


def evaluate(csv_path, xml_dir, classes=None):
    classes = classes or FAIR1M_1_5_CLASSES
    gt = load_gt_xml_dir(xml_dir)
    dets = load_submission_csv(csv_path)
    img_ids = sorted(gt)
    id_map = {img: i for i, img in enumerate(img_ids)}
    aps = {}
    for cls in classes:
        class_gts = {}
        for img, objs in gt.items():
            boxes = [p for (n, p, d) in objs if n == cls]
            diffs = [bool(d) for (n, p, d) in objs if n == cls]
            if boxes:
                class_gts[id_map[img]] = {
                    "box": np.stack(boxes),
                    "det": [False] * len(boxes),
                    "difficult": np.asarray(diffs),
                }
        rows = []
        for (img, score, poly) in dets.get(cls, []):
            if img in id_map:
                rows.append([id_map[img], *poly, score])
        if not rows or not class_gts:
            aps[cls] = 0.0
            continue
        _, _, ap = voc_eval_dota(np.asarray(rows), class_gts)
        aps[cls] = float(ap)
    aps["meanAP"] = float(np.mean([aps[c] for c in classes]))
    return aps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--csv", required=True)
    ap.add_argument("--gt_xml_dir", required=True)
    args = ap.parse_args()
    aps = evaluate(args.csv, args.gt_xml_dir)
    for k, v in aps.items():
        print(f"{k:24s} {v:.4f}")


if __name__ == "__main__":
    main()
