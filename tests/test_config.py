"""Config system tests mirroring the reference's test_config strategy
(``tests/test_config/test_config.py``): _base_ chains, _cover_, py+yaml."""

import os
import textwrap

import pytest

from rs_detection_tpu.config import Config, init_cfg, get_cfg


@pytest.fixture
def cfg_dir(tmp_path):
    def write(name, content):
        p = tmp_path / name
        p.parent.mkdir(parents=True, exist_ok=True)
        p.write_text(textwrap.dedent(content))
        return str(p)

    return tmp_path, write


def test_yaml_basic(cfg_dir):
    tmp, write = cfg_dir
    f = write("a.yaml", """
        model:
          type: S2ANet
          depth: 50
        lr: 0.01
    """)
    cfg = Config(f)
    assert cfg.model.type == "S2ANet"
    assert cfg.model.depth == 50
    assert cfg.lr == 0.01
    assert cfg.name == "a"
    assert cfg.work_dir.endswith(os.path.join("work_dirs", "a"))
    assert cfg.missing_key is None


def test_py_config(cfg_dir):
    tmp, write = cfg_dir
    f = write("b.py", """
        import math
        model = dict(type="OrientedRCNN", backbone=dict(type="VAN", arch="b3"))
        max_epoch = 9
        pi = math.pi
    """)
    cfg = Config(f)
    assert cfg.model.backbone.arch == "b3"
    assert cfg.max_epoch == 9
    assert abs(cfg.pi - 3.14159) < 1e-3
    assert "math" not in cfg  # modules dropped


def test_base_merge(cfg_dir):
    tmp, write = cfg_dir
    write("base.yaml", """
        model:
          type: S2ANet
          backbone:
            depth: 50
            frozen: 1
        lr: 0.01
    """)
    f = write("child.yaml", """
        _base_: base.yaml
        model:
          backbone:
            depth: 101
        lr: 0.02
    """)
    cfg = Config(f)
    assert cfg.model.type == "S2ANet"          # inherited
    assert cfg.model.backbone.depth == 101     # overridden
    assert cfg.model.backbone.frozen == 1      # kept from base
    assert cfg.lr == 0.02


def test_base_list_priority(cfg_dir):
    tmp, write = cfg_dir
    write("b1.yaml", "x: 1\ny: 1\n")
    write("b2.yaml", "x: 2\nz: 2\n")
    f = write("c.yaml", "_base_: [b1.yaml, b2.yaml]\n")
    cfg = Config(f)
    assert cfg.x == 2  # later base wins
    assert cfg.y == 1 and cfg.z == 2


def test_cover_key(cfg_dir):
    tmp, write = cfg_dir
    write("base.yaml", """
        model:
          type: S2ANet
          backbone:
            depth: 50
            frozen: 1
    """)
    f = write("c.yaml", """
        _base_: base.yaml
        model:
          _cover_: true
          type: RetinaNet
    """)
    cfg = Config(f)
    assert cfg.model.type == "RetinaNet"
    assert cfg.model.backbone is None  # fully replaced, not merged
    assert "_cover_" not in cfg.model


def test_nested_base_chain(cfg_dir):
    tmp, write = cfg_dir
    write("sub/grand.yaml", "a: 1\nb: 1\nc: 1\n")
    write("sub/parent.yaml", "_base_: grand.yaml\nb: 2\n")
    f = write("child.yaml", "_base_: sub/parent.yaml\nc: 3\n")
    cfg = Config(f)
    assert (cfg.a, cfg.b, cfg.c) == (1, 2, 3)


def test_global_singleton(cfg_dir):
    tmp, write = cfg_dir
    f = write("g.yaml", "model:\n  type: FCOS\n")
    init_cfg(f)
    assert get_cfg().model.type == "FCOS"


def test_py_base_chain(cfg_dir):
    tmp, write = cfg_dir
    write("base.py", "opt = dict(type='AdamW', lr=1e-4)\n")
    f = write("c.py", "_base_ = ['base.py']\nopt = dict(lr=2e-4)\n")
    cfg = Config(f)
    assert cfg.opt.type == "AdamW"
    assert cfg.opt.lr == 2e-4


def test_dump_roundtrip(cfg_dir, tmp_path):
    tmp, write = cfg_dir
    f = write("d.yaml", "model:\n  type: S2ANet\n  list: [1, 2, 3]\n")
    cfg = Config(f)
    d = cfg.dump()
    assert d["model"]["type"] == "S2ANet"
    assert d["model"]["list"] == [1, 2, 3]
    assert type(d["model"]) is dict


def test_all_shipped_configs_build_models():
    """Every config in configs/ and projects/*/configs must construct
    its model via the registry (reference test strategy: per-project
    config regression)."""
    import glob
    import os

    import rs_detection_tpu.data  # noqa: F401  (populate registries)
    import rs_detection_tpu.models  # noqa: F401
    from rs_detection_tpu.utils.registry import MODELS, build_from_cfg

    root = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
    cfgs = (glob.glob(os.path.join(root, "configs", "*.py"))
            + glob.glob(os.path.join(root, "projects", "*", "configs",
                                     "*.py")))
    cfgs = [c for c in cfgs if "preprocess" not in c]
    assert len(cfgs) >= 10
    for path in cfgs:
        cfg = Config(path)
        if cfg.model is None or (isinstance(cfg.model, dict)
                                 and "type" not in cfg.model):
            # base fragments (yolo_*_base.py) carry no complete model
            assert os.path.basename(path).endswith("_base.py"), \
                f"{path}: no model section"
            continue
        model = build_from_cfg(cfg.model, MODELS)
        assert model is not None, path
