"""Parameter-group generators: per-group weight decay / lr masks.

Capability parity with the reference
(``python/jdet/models/param_generators/parameter_group_generator.py:6-23``
``YoloParameterGroupsGenerator``): split parameters into (biases: no
decay), (norm scales: no decay), (conv/linear weights: decay) groups.

In optax terms the groups become masks for ``optax.masked`` /
``add_decayed_weights`` — returned here as boolean pytrees.
"""

from __future__ import annotations

from typing import Any, Dict

import jax

from ..utils.registry import MODELS


def _is_norm_scale(path) -> bool:
    leaf = str(path[-1])
    return leaf in ("scale",) or "bn" in "/".join(
        str(p) for p in path).lower()


def weight_decay_mask(params: Dict) -> Dict:
    """True where weight decay should apply (conv/linear kernels)."""

    def decide(path, leaf):
        name = str(path[-1].key if hasattr(path[-1], "key")
                   else path[-1])
        if name == "bias":
            return False
        if name == "scale":            # norm scales
            return False
        if leaf.ndim <= 1:             # 1-D params: no decay
            return False
        return True

    return jax.tree_util.tree_map_with_path(decide, params)


@MODELS.register_module()
class YoloParameterGroupsGenerator:
    """Returns the decay mask + per-group lr multipliers matching the
    reference's three YOLO groups."""

    def __init__(self, weight_decay: float = 0.0005, **kw):
        self.weight_decay = weight_decay

    def __call__(self, params) -> Dict[str, Any]:
        mask = weight_decay_mask(params)
        return dict(decay_mask=mask, weight_decay=self.weight_decay)


def make_decayed_tx(base_tx_fn, params, weight_decay: float):
    """Build an optax chain with masked weight decay (the reference's
    group-0/1 no-decay behavior)."""
    import optax

    mask = weight_decay_mask(params)
    return optax.chain(
        optax.masked(optax.add_decayed_weights(weight_decay), mask),
        base_tx_fn())
