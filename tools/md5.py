"""Checksum helper: md5 of checkpoint/submission files (reference
``tools/md5.py`` — used to fingerprint SWA checkpoints before
competition submission; this version takes paths on the CLI instead of
hardcoding them).

    python tools/md5.py work_dir/checkpoints/swa_8-9.pkl [...]
"""

import hashlib
import os
import sys


def get_md5_of_file(file_path: str):
    if not os.path.isfile(file_path):
        return None
    md5 = hashlib.md5()
    with open(file_path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            md5.update(chunk)
    return md5.hexdigest().lower()


if __name__ == "__main__":
    for p in sys.argv[1:]:
        print(f"{get_md5_of_file(p)}  {p}")
