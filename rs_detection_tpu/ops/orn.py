"""Oriented Response Networks: Active Rotating Filters + rotation
invariant pooling/encoding.

Capability parity with the reference inline-CUDA ORN
(``python/jdet/ops/orn.py``: ``arf_forward`` :260, ``ORConv2d`` :620,
``RotationInvariantPooling`` :595, ``RotationInvariantEncoding`` :516).

TPU-first: ARF is a *static permutation* of the weight tensor
(indices depend only on kernel size / nOrientation / nRotation), so it
compiles to a single gather with autodiff providing the scatter-sum
backward that the reference hand-writes. RIP is a reshape + max.
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np

# Rotation index tables for 1x1 and 3x3 kernels (1-based spatial cell
# indices after rotating the kernel by each multiple of 45 degrees).
_KERNEL_INDICES = {
    1: {
        0: (1,), 45: (1,), 90: (1,), 135: (1,),
        180: (1,), 225: (1,), 270: (1,), 315: (1,),
    },
    3: {
        0: (1, 2, 3, 4, 5, 6, 7, 8, 9),
        45: (2, 3, 6, 1, 5, 9, 4, 7, 8),
        90: (3, 6, 9, 2, 5, 8, 1, 4, 7),
        135: (6, 9, 8, 3, 5, 7, 2, 1, 4),
        180: (9, 8, 7, 6, 5, 4, 3, 2, 1),
        225: (8, 7, 4, 9, 5, 1, 6, 3, 2),
        270: (7, 4, 1, 8, 5, 2, 9, 6, 3),
        315: (4, 1, 2, 7, 5, 3, 8, 9, 6),
    },
}


def arf_indices(n_orientation: int, n_rotation: int, k: int) -> np.ndarray:
    """Forward scatter table: entry (l, r) gives the 1-based destination
    slot of source slot ``l`` under rotation ``r``
    (reference ``orn.py:644-680``)."""
    d_or = 360.0 / n_orientation
    d_rot = 360.0 / n_rotation
    n_entry = n_orientation * k * k
    table = np.zeros((n_entry, n_rotation), np.int64)
    for i in range(n_orientation):
        for j in range(k * k):
            for r in range(n_rotation):
                angle = int(d_rot * r)
                layer = (i + int(math.floor(angle / d_or))) % n_orientation
                cell = _KERNEL_INDICES[k][angle][j]
                table[i * k * k + j, r] = layer * k * k + cell
    return table


def arf_gather_indices(n_orientation: int, n_rotation: int,
                       k: int) -> np.ndarray:
    """Inverse permutation [nRotation, nEntry]: for each rotation, the
    source slot feeding each destination slot — turns the reference's
    scatter kernel into a TPU-friendly static gather."""
    fwd = arf_indices(n_orientation, n_rotation, k)  # [nEntry, nRot]
    n_entry = fwd.shape[0]
    inv = np.zeros((n_rotation, n_entry), np.int64)
    for r in range(n_rotation):
        inv[r, fwd[:, r] - 1] = np.arange(n_entry)
    return inv


def active_rotating_filter(weight: jnp.ndarray,
                           gather_idx: np.ndarray) -> jnp.ndarray:
    """Expand ARF weights into all rotated copies.

    Args:
      weight: [Cout, Cin, nOrientation * k * k] flattened ARF weight.
      gather_idx: [nRotation, nEntry] from :func:`arf_gather_indices`.

    Returns:
      [Cout * nRotation, Cin, nEntry] rotated weights, laid out as the
      reference's ``arf_forward`` output
      (o-major: out[o * nRot + r] = rotate_r(weight[o])).
    """
    cout, cin, n_entry = weight.shape
    n_rot = gather_idx.shape[0]
    rotated = weight[:, :, gather_idx.reshape(-1)]          # [Cout, Cin, R*E]
    rotated = rotated.reshape(cout, cin, n_rot, n_entry)
    rotated = jnp.transpose(rotated, (0, 2, 1, 3))          # [Cout, R, Cin, E]
    return rotated.reshape(cout * n_rot, cin, n_entry)


def rotation_invariant_pooling(x: jnp.ndarray, n_orientation: int = 8):
    """Max over orientation groups: [N, H, W, C] -> [N, H, W, C/nOr]
    (reference ``orn.py:595-617``; NHWC here, channel blocks are
    [C/nOr, nOr] to match the NCHW view(N, -1, nOr, H, W) grouping)."""
    n, h, w, c = x.shape
    x = x.reshape(n, h, w, c // n_orientation, n_orientation)
    return x.max(axis=-1)


def rotation_invariant_encoding(x: jnp.ndarray, n_orientation: int = 8):
    """Align each feature group to its dominant orientation
    (reference ``rie_forward`` :516-541): find the orientation with the
    max summed response per group, then circularly shift the
    orientation axis so it comes first.

    Args:
      x: [N, C] pooled features (C = nFeature * nOrientation).

    Returns:
      (aligned [N, C], main_direction [N, nFeature]).
    """
    n, c = x.shape
    nf = c // n_orientation
    g = x.reshape(n, nf, n_orientation)
    main = jnp.argmax(g, axis=-1)                           # [N, nF]
    idx = (main[..., None] + jnp.arange(n_orientation)) % n_orientation
    aligned = jnp.take_along_axis(g, idx, axis=-1)
    return aligned.reshape(n, c), main
