"""ctypes binding for the native tile decoder (tile_decoder.cc).

``decode_image(path)`` and ``decode_batch(paths, w, h)`` return RGB8
HWC numpy arrays with PIL ``convert("RGB")`` semantics; the batch call
decodes on C++ threads with the GIL released (the reference scales
decode with Jittor Dataset worker processes — ``custom.py`` workers;
a thread pool on a real multi-core TPU host does the same from one
process). Falls back to ``None`` when the toolchain or libpng/libjpeg
are unavailable — callers must keep a PIL path.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_HERE, "libtiledecoder.so")
_SRC_PATH = os.path.join(_HERE, "tile_decoder.cc")
_lock = threading.Lock()
_lib = None
_build_failed = False


def _build():
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC_PATH,
           "-o", _LIB_PATH, "-lpng", "-ljpeg", "-lpthread"]
    subprocess.run(cmd, check=True, capture_output=True)


def get_lib():
    global _lib, _build_failed
    if _lib is not None or _build_failed:
        return _lib
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        try:
            if (not os.path.exists(_LIB_PATH)
                    or os.path.getmtime(_LIB_PATH)
                    < os.path.getmtime(_SRC_PATH)):
                _build()
            lib = ctypes.CDLL(_LIB_PATH)
            lib.rs_probe_dims.restype = ctypes.c_int
            lib.rs_probe_dims.argtypes = [
                ctypes.c_char_p, ctypes.POINTER(ctypes.c_int),
                ctypes.POINTER(ctypes.c_int)]
            lib.rs_decode_rgb.restype = ctypes.c_int
            lib.rs_decode_rgb.argtypes = [
                ctypes.c_char_p, ctypes.POINTER(ctypes.c_ubyte),
                ctypes.c_long, ctypes.POINTER(ctypes.c_int),
                ctypes.POINTER(ctypes.c_int)]
            lib.rs_decode_rgb_batch.restype = ctypes.c_int
            lib.rs_decode_rgb_batch.argtypes = [
                ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
                ctypes.POINTER(ctypes.c_ubyte), ctypes.c_int,
                ctypes.c_int, ctypes.c_int,
                ctypes.POINTER(ctypes.c_int)]
            _lib = lib
        except Exception:
            _build_failed = True
    return _lib


def decode_image(path: str):
    """Decode one PNG/JPEG to an RGB8 [H, W, 3] array, or None if the
    native decoder is unavailable. Raises on decode errors."""
    lib = get_lib()
    if lib is None:
        return None
    w = ctypes.c_int()
    h = ctypes.c_int()
    rc = lib.rs_probe_dims(path.encode(), ctypes.byref(w),
                           ctypes.byref(h))
    if rc != 0:
        raise IOError(f"native probe failed (rc={rc}): {path}")
    out = np.empty((h.value, w.value, 3), np.uint8)
    rc = lib.rs_decode_rgb(
        path.encode(),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
        out.nbytes, ctypes.byref(w), ctypes.byref(h))
    if rc != 0:
        raise IOError(f"native decode failed (rc={rc}): {path}")
    return out


def decode_batch(paths, w: int, h: int, nthreads: int | None = None):
    """Decode ``paths`` into a [N, h, w, 3] uint8 batch on C++ threads
    (GIL released for the whole call). Every image must be exactly
    (w, h). Returns None if the native decoder is unavailable; raises
    listing the failed paths otherwise."""
    lib = get_lib()
    if lib is None:
        return None
    n = len(paths)
    out = np.empty((n, h, w, 3), np.uint8)
    rcs = np.zeros((n,), np.int32)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    if nthreads is None:
        nthreads = min(n, os.cpu_count() or 1)
    fails = lib.rs_decode_rgb_batch(
        arr, n, out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
        w, h, nthreads,
        rcs.ctypes.data_as(ctypes.POINTER(ctypes.c_int)))
    if fails:
        bad = [paths[i] for i in np.nonzero(rcs)[0][:5]]
        raise IOError(f"native batch decode: {fails} failures, e.g. "
                      f"{bad} (rcs {rcs[np.nonzero(rcs)[0][:5]]})")
    return out
