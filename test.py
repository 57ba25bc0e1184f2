"""One-shot competition inference driver.

Capability parity with the reference root ``test.py:4-37``: preprocess
the test set (tiling), run inference for each competition model config,
merge submissions into the final ensemble CSV.
"""

import argparse
import glob
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--preprocess-config",
                    default="configs/preprocess/fair1m_1_5_test.py")
    ap.add_argument("--configs", nargs="+",
                    default=["configs/orcnn_van3_fair1m_1_5.py"])
    ap.add_argument("--skip-preprocess", action="store_true")
    ap.add_argument("--merge-thresh", type=float, default=0.625)
    args = ap.parse_args()

    py = sys.executable
    if not args.skip_preprocess and os.path.exists(
            args.preprocess_config):
        subprocess.run([py, "tools/preprocess.py", "--config-file",
                        args.preprocess_config], check=True)

    for cfg in args.configs:
        subprocess.run([py, "tools/run_net.py", "--config-file", cfg,
                        "--task", "test", "--flip_test"], check=True)

    csvs = sorted(glob.glob("submit_zips/*.csv"))
    if len(csvs) >= 2:
        subprocess.run([py, "tools/merge_results.py", "--csvs", *csvs,
                        "--thresh", str(args.merge_thresh)], check=True)
        print("ensemble -> csv_merge/merged_result.csv")
    elif csvs:
        print("single submission ->", csvs[0])


if __name__ == "__main__":
    main()
