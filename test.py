"""One-command competition inference.

Capability parity with the reference root ``test.py:1-37``: tile the
raw test set (skipped if already tiled), run each ensemble member's
test task (skipped if its submission CSV exists), then merge the
member CSVs with cross-model horizontal NMS into the final submission
— without the reference's config-file string rewriting: the test path
is passed through as a config override.
"""

from __future__ import annotations

import argparse
import glob
import os
import subprocess
import sys


def _run(cmd):
    print("+", " ".join(cmd), flush=True)
    subprocess.run(cmd, check=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--test_path", default="../data/testa-3")
    ap.add_argument("--preprocess-config",
                    default="configs/preprocess/fair1m_1_5_ms.py")
    ap.add_argument("--configs", nargs="+",
                    default=["configs/orcnn_van3_fair1m_1_5.py"],
                    help="ensemble member configs (each runs --task "
                         "test unless its CSV already exists)")
    ap.add_argument("--out", default="submit_zips/merged.csv")
    ap.add_argument("--thresh", type=float, default=0.625)
    args = ap.parse_args()

    py = sys.executable
    tiled = glob.glob("data/test_ms/*/images/*")
    if not tiled:
        _run([py, "tools/preprocess.py", "--config-file",
              args.preprocess_config, "--set",
              f"source_dataset_path={args.test_path}"])

    csvs = []
    for cfg in args.configs:
        stem = os.path.splitext(os.path.basename(cfg))[0]
        csv = f"submit_zips/{stem}.csv"
        if not os.path.exists(csv):
            _run([py, "tools/run_net.py", "--config-file", cfg,
                  "--task", "test"])
        csvs.append(csv)

    if len(csvs) > 1:
        _run([py, "tools/merge_results.py", "--csvs", *csvs,
              "--thresh", str(args.thresh), "--out", args.out])
    else:
        print(f"single model — submission at {csvs[0]}")


if __name__ == "__main__":
    main()
