"""ctypes loader for the native (C++) host kernels.

Compiles pbrt_tpu/geom/native/bvh_builder.cc into libbvh.so on first use
(g++ -O3; the environment has no pybind11, so the binding is a plain C
ABI + ctypes). Falls back to the numpy builder if no compiler is found.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_lock = threading.Lock()
_lib = None
_tried = False

_SRC_DIR = os.path.join(os.path.dirname(__file__), "native")
_BUILD_DIR = os.path.join(_SRC_DIR, "build")


def _load():
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        src = os.path.join(_SRC_DIR, "bvh_builder.cc")
        so = os.path.join(_BUILD_DIR, "libbvh.so")
        try:
            if (not os.path.exists(so)
                    or os.path.getmtime(so) < os.path.getmtime(src)):
                os.makedirs(_BUILD_DIR, exist_ok=True)
                subprocess.run(
                    ["g++", "-O3", "-shared", "-fPIC", "-o", so, src],
                    check=True, capture_output=True)
            lib = ctypes.CDLL(so)
            for fn in ("bvh_build_sah", "bvh_build_lbvh"):
                f = getattr(lib, fn)
                f.restype = ctypes.c_int
                f.argtypes = [
                    ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
                    ctypes.c_int, ctypes.c_int,
                    ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
                    ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
                    ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32)]
            _lib = lib
        except Exception:
            _lib = None
        return _lib


def native_available():
    return _load() is not None


def build_bvh_native(prim_min, prim_max, max_leaf=4, method="sah"):
    """Returns (bounds_min, bounds_max, rp, n, axis, order) numpy arrays
    or None if the native library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    t = len(prim_min)
    prim_min = np.ascontiguousarray(prim_min, np.float32)
    prim_max = np.ascontiguousarray(prim_max, np.float32)
    est = 2 * t + 2
    bmin = np.empty((est, 3), np.float32)
    bmax = np.empty((est, 3), np.float32)
    rp = np.empty(est, np.int32)
    n = np.empty(est, np.int32)
    axis = np.empty(est, np.int32)
    order = np.empty(t, np.int32)
    fp = ctypes.POINTER(ctypes.c_float)
    ip = ctypes.POINTER(ctypes.c_int32)
    fn = lib.bvh_build_sah if method == "sah" else lib.bvh_build_lbvh
    m = fn(prim_min.ctypes.data_as(fp), prim_max.ctypes.data_as(fp),
           t, max_leaf,
           bmin.ctypes.data_as(fp), bmax.ctypes.data_as(fp),
           rp.ctypes.data_as(ip), n.ctypes.data_as(ip),
           axis.ctypes.data_as(ip), order.ctypes.data_as(ip))
    return bmin[:m].copy(), bmax[:m].copy(), rp[:m].copy(), n[:m].copy(), \
        axis[:m].copy(), order
