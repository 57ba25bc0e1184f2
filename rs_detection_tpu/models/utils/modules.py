"""Shared NN building blocks (flax.linen, NHWC).

Capability parity with the reference ``ConvModule``
(``python/jdet/models/utils/modules.py``) and misc layers (DropPath,
trunc-normal init) used across backbones/heads — re-designed for TPU:
NHWC layout (XLA's preferred conv layout), bf16-friendly, norm layers
switchable between BatchNorm / GroupNorm / LayerNorm / none.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


def _pair(x):
    return tuple(x) if isinstance(x, (tuple, list)) else (x, x)


from ...ops.activations import exact_gelu  # noqa: E402

ACTIVATIONS = {
    None: None,
    "relu": nn.relu,
    "gelu": exact_gelu,
    "silu": nn.silu,
    "swish": nn.silu,
    "leaky_relu": lambda x: nn.leaky_relu(x, 0.1),
    "sigmoid": nn.sigmoid,
}


def kaiming_normal_fanout():
    """He-normal with fan_out, the reference's conv init."""
    return nn.initializers.variance_scaling(2.0, "fan_out",
                                            "truncated_normal")


class Norm(nn.Module):
    """Configurable norm layer. ``kind``: bn / gn / ln / none."""

    kind: Optional[str] = "bn"
    num_groups: int = 32
    momentum: float = 0.9
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.kind is None or self.kind == "none":
            return x
        if self.kind == "bn":
            return nn.BatchNorm(use_running_average=not train,
                                momentum=self.momentum,
                                epsilon=self.epsilon, dtype=x.dtype)(x)
        if self.kind == "gn":
            return nn.GroupNorm(num_groups=self.num_groups,
                                epsilon=self.epsilon, dtype=x.dtype)(x)
        if self.kind == "ln":
            return nn.LayerNorm(epsilon=1e-6, dtype=x.dtype)(x)
        raise ValueError(self.kind)


def norm_kind_from_cfg(norm_cfg) -> Optional[str]:
    if norm_cfg is None:
        return None
    t = norm_cfg.get("type", "BN") if isinstance(norm_cfg, dict) else norm_cfg
    return {"BN": "bn", "SyncBN": "bn", "GN": "gn", "LN": "ln"}.get(t, "bn")


class ConvModule(nn.Module):
    """conv + norm + act (reference ``models/utils/modules.py``)."""

    out_channels: int
    kernel_size: Union[int, Tuple[int, int]] = 3
    stride: int = 1
    padding: Union[str, int, Tuple[int, int]] = 0
    dilation: int = 1
    groups: int = 1
    bias: Union[bool, str] = "auto"
    norm: Optional[str] = None          # "bn" | "gn" | "ln" | None
    num_groups: int = 32                # for GroupNorm
    act: Optional[str] = "relu"

    @nn.compact
    def __call__(self, x, train: bool = False):
        k = _pair(self.kernel_size)
        pad = self.padding
        if isinstance(pad, int):
            pad = [(pad, pad), (pad, pad)]
        elif isinstance(pad, tuple):
            pad = [(pad[0], pad[0]), (pad[1], pad[1])]
        use_bias = (self.norm is None) if self.bias == "auto" else self.bias
        x = nn.Conv(self.out_channels, k, strides=(self.stride, self.stride),
                    padding=pad, kernel_dilation=(self.dilation,) * 2,
                    feature_group_count=self.groups, use_bias=use_bias,
                    kernel_init=kaiming_normal_fanout(), dtype=x.dtype)(x)
        if self.norm is not None:
            x = Norm(kind=self.norm, num_groups=self.num_groups)(x, train)
        fn = ACTIVATIONS[self.act]
        if fn is not None:
            x = fn(x)
        return x


class DropPath(nn.Module):
    """Stochastic depth (per-sample residual drop)."""

    rate: float = 0.0
    deterministic: Optional[bool] = None

    @nn.compact
    def __call__(self, x, deterministic: Optional[bool] = None):
        det = nn.merge_param("deterministic", self.deterministic,
                             deterministic)
        if det or self.rate == 0.0:
            return x
        keep = 1.0 - self.rate
        rng = self.make_rng("dropout")
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(rng, keep, shape)
        return jnp.where(mask, x / keep, 0.0)


def multi_apply(func: Callable, *args, **kwargs) -> Tuple:
    """Apply ``func`` over zipped argument lists, transposing the
    results (reference ``utils/general.py:50``)."""
    results = [func(*a, **kwargs) for a in zip(*args)]
    return tuple(map(list, zip(*results)))
