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


def _conv_bias_mask(params):
    """True on biases that sit next to a 4-D conv kernel (the
    reference's conv-bias group, projects/retinanet/models.py:14-65)."""

    def walk(tree):
        out = {}
        kernel = tree.get("kernel") if isinstance(tree, dict) else None
        is_conv = getattr(kernel, "ndim", 0) == 4
        for k, v in tree.items():
            if isinstance(v, dict):
                out[k] = walk(v)
            else:
                out[k] = bool(is_conv and k == "bias")
        return out

    return walk(params)


def _expand_prefix(pref: str):
    """Translate reference-style resnet stage names to this repo's
    flax tree: ``backbone.C1`` = the stem (anonymous ``Conv_0`` /
    ``Norm_0`` modules), ``backbone.C<k>`` = ``layer<k-1>_*`` blocks
    (reference projects/retinanet/models.py freeze groups)."""
    import re

    head, _, tail = pref.rpartition(".")
    m = re.fullmatch(r"C([1-5])", tail)
    if not m:
        return [pref]
    base = head + "." if head else ""
    k = int(m.group(1))
    if k == 1:
        return [base + "Conv_", base + "Norm_"]
    return [base + f"layer{k - 1}_", base + f"layer{k - 1}."]


def _prefix_mask(params, prefixes):
    """True on every leaf whose dotted path starts with a prefix.
    Raises if NO leaf matches — a freeze/grouping prefix that matches
    nothing means the recipe silently trains what it meant to freeze."""
    import jax

    expanded = tuple(q.replace("/", ".")
                     for p in prefixes
                     for q in _expand_prefix(str(p).replace("/", ".")))

    def decide(path, leaf):
        name = ".".join(str(p.key if hasattr(p, "key") else p)
                        for p in path)
        return any(name.startswith(pref) or name == pref
                   for pref in expanded)

    mask = jax.tree_util.tree_map_with_path(decide, params)
    if prefixes and not any(jax.tree_util.tree_leaves(mask)):
        tops = sorted(params)[:20] if isinstance(params, dict) else []
        raise ValueError(
            f"parameter-group prefixes {tuple(prefixes)} (expanded to "
            f"{expanded}) matched NO parameters; top-level names: "
            f"{tops}")
    return mask


@MODELS.register_module()
def NormalPrameterGroupsGenerator(**kw):
    """Identity grouping (reference projects/retinanet/models.py:6-11;
    name spelling preserved for config parity)."""

    def wrap(tx, base_weight_decay=0.0):
        return tx

    return wrap


@MODELS.register_module()
def YangXuePrameterGroupsGenerator(conv_bias_grad_muyilpy: float = 1.0,
                                   conv_bias_weight_decay: float = -1,
                                   freeze_prefix=(), **kw):
    """The reference retinanet recipe's parameter grouping
    (projects/retinanet/models.py:14-65; name spelling preserved):
    conv biases get a gradient multiplier and optionally their own
    weight decay; ``freeze_prefix`` parameters receive no updates.

    optax formulation: a masked ``scale`` before the base transform
    (grad multiplier), a masked ``add_decayed_weights`` delta
    correcting the base decay on conv biases, and a masked
    ``set_to_zero`` after it (freeze).
    """
    import optax

    def wrap(tx, base_weight_decay: float = 0.0):
        links = []
        if conv_bias_grad_muyilpy != 1.0:
            links.append(optax.masked(
                optax.scale(conv_bias_grad_muyilpy), _conv_bias_mask))
        if conv_bias_weight_decay >= 0 and base_weight_decay:
            links.append(optax.masked(
                optax.add_decayed_weights(
                    conv_bias_weight_decay - base_weight_decay),
                _conv_bias_mask))
        links.append(tx)
        if freeze_prefix:
            links.append(optax.masked(
                optax.set_to_zero(),
                lambda p: _prefix_mask(p, freeze_prefix)))
        return optax.chain(*links)

    return wrap
