"""The in-repo config zoo: self-contained "configs run verbatim".

The reference ships ~90 configs (``configs/**`` +
``projects/*/configs/*.py``, SURVEY §2.6); this repo ships value-
identical ports at the same relative locations (see
``tools/port_reference_configs.py``), so the config contract holds
with ``/root/reference`` unmounted.

Two checks:
  * every in-repo zoo config loads through the config system and
    builds its model through the registry (no reference needed);
  * when the reference IS mounted, re-porting each reference config
    must reproduce the in-repo file byte-for-byte — the zoo cannot
    silently drift from the reference recipes.
"""

import glob
import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF = "/root/reference"


def _zoo_configs():
    cfgs = sorted(
        glob.glob(os.path.join(REPO, "configs", "**", "*.py"),
                  recursive=True)
        + glob.glob(os.path.join(REPO, "projects", "*", "configs",
                                 "*.py")))
    return [c for c in cfgs if "preprocess" not in c]


ZOO = _zoo_configs()
_IDS = [os.path.relpath(p, REPO) for p in ZOO]


@pytest.mark.parametrize("path", ZOO, ids=_IDS)
def test_zoo_config_builds_model(path):
    import rs_detection_tpu.data  # noqa: F401  (populate registries)
    import rs_detection_tpu.models  # noqa: F401
    from rs_detection_tpu.config.config import Config
    from rs_detection_tpu.utils.registry import MODELS, build_from_cfg

    cfg = Config(path)
    if cfg.model is None or (isinstance(cfg.model, dict)
                             and "type" not in cfg.model):
        # base fragments (yolo_*_base.py) carry no complete model
        assert os.path.basename(path).endswith("_base.py"), \
            f"{path}: no model section"
        return
    model = build_from_cfg(cfg.model, MODELS)
    assert model is not None, path


def test_zoo_covers_every_reference_config():
    """Each reference config file must have an in-repo counterpart at
    the same relative path (zoo completeness)."""
    if not os.path.isdir(REF):
        pytest.skip("reference repo not mounted")
    sys.path.insert(0, os.path.join(REPO, "tools"))
    import port_reference_configs as port

    missing = []
    for path in port.reference_configs(REF):
        dst, rel = port.ported_pair(REF, path)
        if not os.path.isfile(dst):
            missing.append(rel)
    assert not missing, f"unported reference configs: {missing}"


def test_zoo_matches_reference_recipes():
    """Re-porting the reference must reproduce the in-repo zoo exactly
    (value-level parity; catches both drift and hand edits)."""
    if not os.path.isdir(REF):
        pytest.skip("reference repo not mounted")
    sys.path.insert(0, os.path.join(REPO, "tools"))
    import port_reference_configs as port

    stale = []
    for path in port.reference_configs(REF):
        dst, rel = port.ported_pair(REF, path)
        if not os.path.isfile(dst):
            continue  # covered by the completeness test
        text = port.render(port.port_one(REF, path), rel)
        with open(dst) as f:
            if f.read() != text:
                stale.append(rel)
    assert not stale, (
        f"in-repo zoo out of date for: {stale} — regenerate with "
        "tools/port_reference_configs.py")
