"""Native (C++) host-runtime components.

The reference implements its hot loops as inline CUDA/C++ compiled at
runtime by Jittor's jt.code (SURVEY §2.3). The TPU compute path here is
XLA/Pallas; host-side hot loops (the tile-merge polygon NMS,
result_merge.py:66-128) get true native implementations, compiled once
with g++ and bound through ctypes.
"""

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_HERE, "libpolynms.so")
_SRC_PATH = os.path.join(_HERE, "poly_nms.cc")
_lock = threading.Lock()
_lib = None
_build_failed = False


def _build():
    cmd = ["g++", "-O3", "-shared", "-fPIC", _SRC_PATH,
           "-o", _LIB_PATH]
    subprocess.run(cmd, check=True, capture_output=True)


def get_lib():
    """Load (building on first use) the native library, or None if no
    toolchain is available — callers fall back to numpy."""
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
            lib.poly_nms.restype = ctypes.c_int64
            lib.poly_nms.argtypes = [
                ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
                ctypes.c_double, ctypes.POINTER(ctypes.c_int64)]
            lib.poly_iou_batch.restype = None
            lib.poly_iou_batch.argtypes = [
                ctypes.POINTER(ctypes.c_double),
                ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
                ctypes.POINTER(ctypes.c_double)]
            _lib = lib
        except Exception:
            _build_failed = True
    return _lib


def poly_nms_native(dets: np.ndarray, thresh: float):
    """Greedy poly NMS in C++; returns kept indices (score-descending)
    or None if the native library is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    dets = np.ascontiguousarray(dets, np.float64)
    n = dets.shape[0]
    keep = np.zeros(n, np.int64)
    n_keep = lib.poly_nms(
        dets.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), n,
        float(thresh), keep.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
    return keep[:n_keep]


def poly_iou_batch_native(query: np.ndarray, cands: np.ndarray):
    lib = get_lib()
    if lib is None:
        return None
    query = np.ascontiguousarray(query, np.float64).reshape(8)
    cands = np.ascontiguousarray(cands, np.float64).reshape(-1, 8)
    out = np.zeros(cands.shape[0], np.float64)
    lib.poly_iou_batch(
        query.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        cands.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        cands.shape[0],
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
    return out
