"""Native (C++) host-side components, loaded via ctypes with pure-Python
fallbacks. Build with ``make -C fsrl_tpu/native`` (done automatically on first
use when a compiler is available)."""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    so = os.path.join(_DIR, "libgridfilter.so")
    if not os.path.exists(so):
        try:
            subprocess.run(["make", "-C", _DIR], check=True,
                           capture_output=True, timeout=120)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(so)
        lib.grid_filter.restype = ctypes.c_long
        lib.grid_filter.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.c_long, ctypes.c_long,
            ctypes.c_uint, ctypes.POINTER(ctypes.c_long),
        ]
        _LIB = lib
    except OSError:
        _LIB = None
    return _LIB


def grid_filter_native(points: np.ndarray, target_size: int,
                       seed: int = 0) -> Optional[list[int]]:
    """C++ grid-density filter; returns kept indices or None when the native
    library is unavailable (caller falls back to the Python implementation)."""
    lib = _load()
    if lib is None:
        return None
    pts = np.ascontiguousarray(points, dtype=np.float64)
    n = pts.shape[0]
    out = np.empty(max(target_size, 1), dtype=np.int64)
    kept = lib.grid_filter(
        pts.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        ctypes.c_long(n), ctypes.c_long(target_size), ctypes.c_uint(seed),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_long)),
    )
    return out[:kept].tolist()
