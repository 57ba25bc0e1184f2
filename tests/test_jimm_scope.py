"""jimm backbone-library scope closure (VERDICT round-2 #8).

The reference bundles a 257-model timm port (``backbones/jimm/**``);
only the VAN family and two Swin-384 variants are config-reachable.
Those get real aliases; every other jimm name must fail LOUDLY with an
actionable message, never a silent unknown-type error.
"""

import pytest


def _registry():
    import rs_detection_tpu.models  # noqa: F401

    from rs_detection_tpu.utils.registry import BACKBONES, build_from_cfg

    return BACKBONES, build_from_cfg


def test_every_jimm_name_is_registered():
    BACKBONES, _ = _registry()
    from rs_detection_tpu.models.backbones.jimm_scope import \
        UNPORTED_JIMM_MODELS

    assert len(UNPORTED_JIMM_MODELS) == 256
    for name in UNPORTED_JIMM_MODELS:
        assert name in BACKBONES, name
    for name in ("van_tiny", "van_small", "van_base", "van_large",
                 "swin_base_patch4_window12_384_in22k",
                 "swin_large_patch4_window12_384_in22k"):
        assert name in BACKBONES, name


def test_ported_aliases_build_real_backbones():
    _, build = _registry()
    van = build(dict(type="van_large"), __import__(
        "rs_detection_tpu.utils.registry", fromlist=["BACKBONES"]
    ).BACKBONES)
    assert type(van).__name__ == "VAN"
    # van_large == van_b3 (the competition backbone): same stage widths
    assert tuple(van.embed_dims) == (64, 128, 320, 512)


def test_unported_jimm_name_raises_actionable_error():
    BACKBONES, build = _registry()
    with pytest.raises(NotImplementedError, match="efficientnet_b0.*not ported"):
        build(dict(type="efficientnet_b0"), BACKBONES)
    with pytest.raises(NotImplementedError, match="port its architecture"):
        build(dict(type="volo_d5"), BACKBONES)
