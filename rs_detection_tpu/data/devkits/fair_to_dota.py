"""FAIR XML annotations -> DOTA labelTxt + renamed pngs.

Capability parity with the reference
(``python/jdet/data/devkits/fair_to_dota.py:37-101``): image renaming
``<n>.tif -> P<n:04>.png``, XML point parsing into 8-coord polys with
class names underscored, and the split-list variant
(``fair_to_dota_select`` :66).
"""

from __future__ import annotations

import os
import xml.etree.ElementTree as ET
from typing import List, Optional

import cv2


def solve_xml(src: str, tar: str):
    """Parse one FAIR labelXml into DOTA txt lines."""
    tree = ET.parse(src)
    root = tree.getroot()
    lines = []
    for obj in root.iter("object"):
        name_el = obj.find("possibleresult/name")
        if name_el is None:
            continue
        name = (name_el.text or "").strip().replace(" ", "_")
        pts: List[float] = []
        for pt in obj.iter("point"):
            x, y = (pt.text or "0,0").split(",")
            pts += [float(x), float(y)]
        # points are closed (first repeated last) — keep the first 4
        if len(pts) >= 8:
            coords = pts[:8]
            lines.append(" ".join(str(c) for c in coords)
                         + f" {name} 0\n")
    with open(tar, "w") as f:
        f.writelines(lines)


def fair_to_dota(in_path: str, out_path: str,
                 file_names: Optional[List[str]] = None):
    os.makedirs(os.path.join(out_path, "images"), exist_ok=True)
    img_dir = os.path.join(in_path, "images")
    names = file_names if file_names is not None else sorted(
        os.path.splitext(f)[0] for f in os.listdir(img_dir))
    for n in names:
        for ext in (".tif", ".png", ".jpg"):
            src = os.path.join(img_dir, n + ext)
            if os.path.exists(src):
                break
        else:
            continue
        tar = os.path.join(out_path, "images", "P" + n.zfill(4) + ".png")
        img = cv2.imread(src, 1)
        if img is not None:
            cv2.imwrite(tar, img)
    xml_dir = os.path.join(in_path, "labelXml")
    if os.path.isdir(xml_dir):
        os.makedirs(os.path.join(out_path, "labelTxt"), exist_ok=True)
        for n in names:
            src = os.path.join(xml_dir, n + ".xml")
            if not os.path.exists(src):
                continue
            tar = os.path.join(out_path, "labelTxt",
                               "P" + n.zfill(4) + ".txt")
            solve_xml(src, tar)
    return out_path


def fair_to_dota_select(in_path: str, out_path: str, split_path: str):
    with open(split_path) as f:
        names = [n for n in f.read().split("\n") if n]
    return fair_to_dota(in_path, out_path, file_names=names)


def ssdd_to_dota(in_path: str, out_path: str):
    """SSDD VOC-XML -> DOTA txt (reference ``ssdd_to_dota.py:46``):
    horizontal xmin/ymin/xmax/ymax boxes become 4-corner polys."""
    os.makedirs(os.path.join(out_path, "labelTxt"), exist_ok=True)
    os.makedirs(os.path.join(out_path, "images"), exist_ok=True)
    xml_dir = os.path.join(in_path, "Annotations")
    img_dir = os.path.join(in_path, "JPEGImages")
    for f in sorted(os.listdir(xml_dir)):
        if not f.endswith(".xml"):
            continue
        tree = ET.parse(os.path.join(xml_dir, f))
        lines = []
        for obj in tree.getroot().iter("object"):
            bb = obj.find("bndbox")
            if bb is None:
                continue
            x1 = float(bb.findtext("xmin", "0"))
            y1 = float(bb.findtext("ymin", "0"))
            x2 = float(bb.findtext("xmax", "0"))
            y2 = float(bb.findtext("ymax", "0"))
            lines.append(f"{x1} {y1} {x2} {y1} {x2} {y2} {x1} {y2} "
                         "ship 0\n")
        name = os.path.splitext(f)[0]
        with open(os.path.join(out_path, "labelTxt", name + ".txt"),
                  "w") as out:
            out.writelines(lines)
        src_img = os.path.join(img_dir, name + ".jpg")
        if os.path.exists(src_img):
            img = cv2.imread(src_img, 1)
            cv2.imwrite(os.path.join(out_path, "images", name + ".png"),
                        img)
    return out_path
