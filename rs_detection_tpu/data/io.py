"""Image IO for the data pipeline: native decoder with PIL fallback.

The per-item loaders (custom/image/scene datasets) run on thread
workers; PIL's decode holds the GIL so threads never scale. The native
decoder (``native/tile_decoder.cc``) releases the GIL inside the
ctypes call, so a multi-core host parallelizes decode across the
existing worker threads with no process pool (the reference's
equivalent is Jittor Dataset worker processes,
``python/jdet/data/custom.py`` workers). Output is byte-identical to
``PIL.Image.open(p).convert("RGB")`` (tests/test_native_decoder.py);
any unsupported format or native failure falls back to PIL.
"""

from __future__ import annotations

import numpy as np
from PIL import Image


def load_rgb_array(path: str) -> np.ndarray:
    """Decode to an RGB8 [H, W, 3] array (native if possible)."""
    try:
        from ..native.decoder import decode_image

        arr = decode_image(path)
        if arr is not None:
            return arr
    except Exception:
        pass
    return np.asarray(Image.open(path).convert("RGB"), np.uint8)


def load_rgb(path: str) -> Image.Image:
    """Decode to a PIL RGB image (the transforms pipeline operates on
    PIL pre-batching, SURVEY §A.7)."""
    try:
        from ..native.decoder import decode_image

        arr = decode_image(path)
        if arr is not None:
            return Image.fromarray(arr)
    except Exception:
        pass
    return Image.open(path).convert("RGB")
