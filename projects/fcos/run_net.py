"""Per-project entry point (extension-point parity with the reference
``projects/<model>/run_net.py`` pattern, README.md:86-105): projects may
define local model extensions in ``models.py`` before dispatching to the
shared CLI."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", ".."))

try:
    import models  # noqa: F401  (local extensions, optional)
except ImportError:
    pass

from tools.run_net import main  # noqa: E402

if __name__ == "__main__":
    main()
