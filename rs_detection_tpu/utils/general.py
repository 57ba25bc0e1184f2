"""General utilities.

Capability parity with the reference ``python/jdet/utils/general.py``:
``multi_apply`` (:50), ``parse_losses`` (:67-79), ``set_random_seed``
(:82), ``build_file``, ``check_interval``, ``search_ckpt`` (:158-163),
``list_images``; ``sync`` becomes a no-op host fetch (XLA collectives
replace MPI all-reduce — values coming off a DP mesh are already
reduced).
"""

from __future__ import annotations

import glob
import os
import random
import re
from typing import Dict, List, Optional

import numpy as np


def multi_apply(func, *args, **kwargs):
    results = [func(*a, **kwargs) for a in zip(*args)]
    return tuple(map(list, zip(*results)))


def parse_losses(losses: Dict) -> float:
    """Sum every entry whose key contains 'loss'
    (reference ``general.py:67-79``)."""
    return sum(float(np.asarray(v).sum())
               for k, v in losses.items() if "loss" in k)


def set_random_seed(seed: int):
    random.seed(seed)
    np.random.seed(seed)


def sync(data):
    """Fetch device values to host python/numpy (the reference also
    all-reduced across MPI ranks; DP-mesh outputs are already global)."""
    if isinstance(data, dict):
        return {k: sync(v) for k, v in data.items()}
    if isinstance(data, (list, tuple)):
        return type(data)(sync(v) for v in data)
    try:
        arr = np.asarray(data)
        return arr.item() if arr.ndim == 0 else arr
    except Exception:
        return data


def build_file(work_dir: str, prefix: str) -> str:
    """Make ``work_dir/prefix`` parents and return the path."""
    path = os.path.join(work_dir, prefix)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    return path


def check_interval(step: Optional[int], interval: Optional[int]) -> bool:
    if step is None or interval is None or interval <= 0:
        return False
    return (step + 1) % interval == 0


def search_ckpt(work_dir: str) -> Optional[str]:
    """Find the highest-epoch checkpoint dir/file under
    ``work_dir/checkpoints`` (reference ``general.py:158-163``)."""
    files = glob.glob(os.path.join(work_dir, "checkpoints", "ckpt_*"))
    if not files:
        return None

    def epoch_of(f):
        m = re.search(r"ckpt_(\d+)", os.path.basename(f))
        return int(m.group(1)) if m else -1

    return max(files, key=epoch_of)


def list_images(img_dir: str) -> List[str]:
    exts = (".png", ".jpg", ".jpeg", ".bmp", ".tif", ".tiff")
    out = []
    for root, _, files in os.walk(img_dir):
        out += [os.path.join(root, f) for f in files
                if f.lower().endswith(exts)]
    return sorted(out)


def to_np(x):
    return np.asarray(x)


def unmap(data, count: int, inds, fill=0):
    """Scatter ``data`` rows back into a ``count``-row array at ``inds``
    (reference ``general.py:55`` — used to undo valid-anchor masking).
    Accepts numpy or jax arrays."""
    shape = (count,) + tuple(data.shape[1:])
    if isinstance(data, np.ndarray):
        out = np.full(shape, fill, dtype=data.dtype)
        out[np.asarray(inds)] = data
        return out
    import jax.numpy as jnp

    out = jnp.full(shape, fill, dtype=data.dtype)
    return out.at[inds].set(data)
