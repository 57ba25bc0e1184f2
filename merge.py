"""Competition ensemble entry point (name parity with the reference's
repo-root ``merge.py``): merge N FAIR1M-1.5 submission CSVs via
per-image-per-class hbb NMS across models (thresh 0.625, soft-NMS
optional). Implementation lives in ``tools/merge_results.py``.
"""

from tools.merge_results import main

if __name__ == "__main__":
    main()
