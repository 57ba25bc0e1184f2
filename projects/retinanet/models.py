"""Project-local model extensions (reference
``projects/retinanet/models.py``).

The reference registers its parameter-group generators from this file
(``NormalPrameterGroupsGenerator`` / ``YangXuePrameterGroupsGenerator``,
reference :6-65 — the retinanet recipe configs depend on them). This
port promotes the implementations to the core library
(``rs_detection_tpu/models/param_generators.py``) so the zoo configs
work from ANY entry point; importing this module (which
``projects/retinanet/run_net.py`` does via its local-extensions hook)
guarantees registration and demonstrates the project extension point.
"""

from rs_detection_tpu.models.param_generators import (  # noqa: F401
    NormalPrameterGroupsGenerator, YangXuePrameterGroupsGenerator)
