"""Regression entry for this project (reference
``projects/roi_transformer/regress_roi_transformer.py`` pattern): delegates to the shared
pytest harness — golden-loss / smoke tests for this model family."""

import os
import subprocess
import sys

if __name__ == "__main__":
    root = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "..", "..")
    sys.exit(subprocess.call(
        [sys.executable, "-m", "pytest",
         os.path.join(root, "tests", "test_golden_loss.py"),
         "-k", "roitrans", "-x", "-q"],
        env={**os.environ, "JAX_PLATFORMS": "cpu"}))
