"""mmrotate-style DOTA split CLI (reference
``tools/data/dota/split/img_split.py`` + ``split_configs/*.json``):
reads a JSON base config (sizes/gaps/rates/dirs) and drives the
shapely-free tiler in ``rs_detection_tpu.data.devkits.img_split``.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.abspath(__file__)), *[".."] * 4))

from rs_detection_tpu.data.devkits.img_split import process  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--base-json", required=True)
    ap.add_argument("--nproc", type=int, default=8)
    args = ap.parse_args()
    with open(args.base_json) as f:
        cfg = json.load(f)
    for img_dir in cfg["img_dirs"]:
        src = os.path.dirname(img_dir.rstrip("/"))
        for size, gap in zip(cfg["sizes"],
                             cfg["gaps"] * len(cfg["sizes"])):
            process(src, cfg["save_dir"], gap=gap, subsize=size,
                    rates=tuple(cfg.get("rates", [1.0])),
                    num_process=args.nproc)


if __name__ == "__main__":
    main()
