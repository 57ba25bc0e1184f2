"""Regression harness runner (reference ``tools/test_models.py:1-19``):
run every project's golden-loss regression test."""

import glob
import os
import subprocess
import sys


def main():
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    failures = []
    for test in sorted(glob.glob(os.path.join(root, "projects", "*",
                                              "regress_*.py"))):
        print("==>", test)
        rc = subprocess.call([sys.executable, test])
        if rc != 0:
            failures.append(test)
    if failures:
        print("FAILED:", failures)
        sys.exit(1)
    print("all project regressions passed")


if __name__ == "__main__":
    main()
