"""Swin Transformer backbone (flax.linen, NHWC).

Capability parity with the reference Swin
(``python/jdet/models/backbones/swin.py``, which wraps the bundled jimm
port): patch embed, windowed multi-head self-attention with relative
position bias, shifted windows on alternate blocks, patch merging
between stages; tiny/small/base variants.

TPU-first: window partition is pure reshape/transpose (static window
size), the shifted-window attention mask is a precomputed constant, and
attention runs as batched MXU matmuls over [num_windows*B, heads,
tokens, dim].
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ...utils.registry import BACKBONES
from ..utils.modules import DropPath, exact_gelu


def window_partition(x, ws: int):
    b, h, w, c = x.shape
    x = x.reshape(b, h // ws, ws, w // ws, ws, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws * ws, c)


def window_reverse(windows, ws: int, h: int, w: int):
    b = windows.shape[0] // ((h // ws) * (w // ws))
    x = windows.reshape(b, h // ws, w // ws, ws, ws, -1)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h, w, -1)


def _relative_position_index(ws: int) -> np.ndarray:
    coords = np.stack(np.meshgrid(np.arange(ws), np.arange(ws),
                                  indexing="ij"))
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]
    rel = rel.transpose(1, 2, 0)
    rel[:, :, 0] += ws - 1
    rel[:, :, 1] += ws - 1
    rel[:, :, 0] *= 2 * ws - 1
    return rel.sum(-1)


def _shift_attn_mask(h: int, w: int, ws: int, shift: int) -> np.ndarray:
    """Attention mask for shifted windows (block-diagonal regions)."""
    img_mask = np.zeros((1, h, w, 1), np.float32)
    cnt = 0
    for hs in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
        for wslice in (slice(0, -ws), slice(-ws, -shift),
                       slice(-shift, None)):
            img_mask[:, hs, wslice, :] = cnt
            cnt += 1
    mask_windows = img_mask.reshape(1, h // ws, ws, w // ws, ws, 1) \
        .transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws * ws)
    attn = mask_windows[:, None, :] - mask_windows[:, :, None]
    return np.where(attn != 0, -100.0, 0.0).astype(np.float32)


class WindowAttention(nn.Module):
    dim: int
    num_heads: int
    window_size: int

    @nn.compact
    def __call__(self, x, mask=None):
        bw, n, c = x.shape
        ws = self.window_size
        head_dim = self.dim // self.num_heads
        qkv = nn.Dense(self.dim * 3, name="qkv")(x)
        qkv = qkv.reshape(bw, n, 3, self.num_heads, head_dim)
        q, k, v = (qkv[:, :, i].transpose(0, 2, 1, 3) for i in range(3))
        q = q * (head_dim ** -0.5)
        attn = jnp.einsum("bhnd,bhmd->bhnm", q, k)

        rpb_table = self.param(
            "relative_position_bias_table",
            nn.initializers.normal(0.02),
            ((2 * ws - 1) ** 2, self.num_heads))
        rpi = jnp.asarray(_relative_position_index(ws).reshape(-1))
        bias = rpb_table[rpi].reshape(n, n, self.num_heads)
        attn = attn + bias.transpose(2, 0, 1)[None]
        if mask is not None:
            nw = mask.shape[0]
            attn = attn.reshape(bw // nw, nw, self.num_heads, n, n)
            attn = attn + mask[None, :, None]
            attn = attn.reshape(bw, self.num_heads, n, n)
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhnm,bhmd->bhnd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(bw, n, self.dim)
        return nn.Dense(self.dim, name="proj")(out)


class SwinBlock(nn.Module):
    dim: int
    num_heads: int
    window_size: int = 7
    shift: int = 0
    mlp_ratio: float = 4.0
    drop_path: float = 0.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, w, c = x.shape
        ws = min(self.window_size, h, w)
        shift = self.shift if ws < min(h, w) else 0
        shortcut = x
        x = nn.LayerNorm(name="norm1")(x)
        # pad to window multiples (official Swin semantics: zero pad,
        # unpad after attention; the shifted mask is built on the
        # padded grid)
        hp = -(-h // ws) * ws
        wp = -(-w // ws) * ws
        if hp != h or wp != w:
            x = jnp.pad(x, ((0, 0), (0, hp - h), (0, wp - w), (0, 0)))
        if shift > 0:
            x = jnp.roll(x, (-shift, -shift), axis=(1, 2))
            mask = jnp.asarray(_shift_attn_mask(hp, wp, ws, shift))
        else:
            mask = None
        wins = window_partition(x, ws)
        wins = WindowAttention(self.dim, self.num_heads, ws,
                               name="attn")(wins, mask)
        x = window_reverse(wins, ws, hp, wp)
        if shift > 0:
            x = jnp.roll(x, (shift, shift), axis=(1, 2))
        if hp != h or wp != w:
            x = x[:, :h, :w]
        x = shortcut + DropPath(self.drop_path)(x,
                                                deterministic=not train)
        h2 = nn.LayerNorm(name="norm2")(x)
        h2 = nn.Dense(int(self.dim * self.mlp_ratio), name="fc1")(h2)
        h2 = exact_gelu(h2)
        h2 = nn.Dense(self.dim, name="fc2")(h2)
        return x + DropPath(self.drop_path)(h2, deterministic=not train)


class Swin(nn.Module):
    embed_dim: int = 96
    depths: Sequence[int] = (2, 2, 6, 2)
    num_heads: Sequence[int] = (3, 6, 12, 24)
    window_size: int = 7
    drop_path_rate: float = 0.2
    out_indices: Sequence[int] = (0, 1, 2, 3)

    @nn.compact
    def __call__(self, x, train: bool = False) -> Tuple[jnp.ndarray, ...]:
        x = nn.Conv(self.embed_dim, (4, 4), (4, 4), padding=0,
                    name="patch_embed")(x)
        x = nn.LayerNorm(name="patch_norm")(x)
        dpr = np.linspace(0, self.drop_path_rate, sum(self.depths))
        cur = 0
        outs = []
        dim = self.embed_dim
        for i, (depth, heads) in enumerate(zip(self.depths,
                                               self.num_heads)):
            for j in range(depth):
                x = SwinBlock(dim, heads, self.window_size,
                              shift=0 if j % 2 == 0
                              else self.window_size // 2,
                              drop_path=float(dpr[cur + j]),
                              name=f"block{i}_{j}")(x, train)
            cur += depth
            if i in self.out_indices:
                outs.append(nn.LayerNorm(name=f"out_norm{i}")(x))
            if i < len(self.depths) - 1:
                # patch merging: 2x2 -> 2*dim (pad odd dims like the
                # official impl)
                b, h, w, c = x.shape
                if h % 2 or w % 2:
                    x = jnp.pad(x, ((0, 0), (0, h % 2), (0, w % 2),
                                    (0, 0)))
                    b, h, w, c = x.shape
                x = x.reshape(b, h // 2, 2, w // 2, 2, c) \
                    .transpose(0, 1, 3, 2, 4, 5) \
                    .reshape(b, h // 2, w // 2, 4 * c)
                x = nn.LayerNorm(name=f"merge_norm{i}")(x)
                x = nn.Dense(2 * dim, use_bias=False,
                             name=f"merge{i}")(x)
                dim *= 2
        return tuple(outs)


def _swin_tiny(pretrained=False, **kw):
    return Swin(embed_dim=96, depths=(2, 2, 6, 2),
                num_heads=(3, 6, 12, 24), **kw)


def _swin_small(pretrained=False, **kw):
    return Swin(embed_dim=96, depths=(2, 2, 18, 2),
                num_heads=(3, 6, 12, 24), **kw)


def _swin_base(pretrained=False, **kw):
    return Swin(embed_dim=128, depths=(2, 2, 18, 2),
                num_heads=(4, 8, 16, 32), **kw)


BACKBONES.register_module(name="Swin", module=Swin)
BACKBONES.register_module(name="swin_tiny", module=_swin_tiny)
BACKBONES.register_module(name="swin_small", module=_swin_small)
BACKBONES.register_module(name="swin_base", module=_swin_base)
