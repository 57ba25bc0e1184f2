"""Format a validation-log AP line into ordered per-class tables.

Capability parity with the reference
``tools/analysis_tools/get_map_str.py`` (hardcoded string slicing) —
generalized: parses every ``<Name>_AP:<float>`` token plus ``meanAP``
from a log line, then prints the values in submission-number order and
in dataset-class order.
"""

import argparse
import re

from rs_detection_tpu.config.constant import get_classes_by_name

NUMBER_ORDER = ["Vehicle", "Airplane", "Ship", "Intersection",
                "Tennis_Court", "Basketball_Court", "Bridge",
                "Baseball_Field", "Football_Field", "Roundabout"]


def parse_ap_line(line: str):
    aps = {m.group(1): float(m.group(2))
           for m in re.finditer(r"(\w+)_AP:([0-9.]+)", line)}
    mean = re.search(r"meanAP:([0-9.]+)", line)
    return aps, float(mean.group(1)) if mean else None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("line", help="log line containing X_AP:... tokens")
    ap.add_argument("--dataset", default="FAIR1M_1_5")
    args = ap.parse_args()
    aps, mean = parse_ap_line(args.line)

    print("Number Order:\n")
    for name in NUMBER_ORDER:
        if name in aps:
            print(f"{aps[name]:.4f}  - {name}")
    print("\nCLASSES Order:\n")
    for name in get_classes_by_name(args.dataset):
        if name in aps:
            print(f"{aps[name]:.4f}  - {name}")
    if mean is not None:
        print(f"{mean:.4f}  - meanAP")


if __name__ == "__main__":
    main()
