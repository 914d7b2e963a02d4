"""ctypes bindings for the native host helpers (built on demand).

The shared library is compiled once with g++ -O3 and cached next to the
source; set POLYSTOKES_NATIVE=0 to disable (pure-Python fallbacks are used
by callers when the library is unavailable).
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "polystokes_native.cpp")
_SO = os.path.join(_DIR, "libpolystokes_native.so")

_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    try:
        if os.path.exists(_SO) and os.path.getmtime(_SO) >= os.path.getmtime(_SRC):
            return True
        subprocess.run(
            ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", _SRC, "-o", _SO],
            check=True,
            capture_output=True,
        )
        return True
    except Exception:  # noqa: BLE001
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if os.environ.get("POLYSTOKES_NATIVE", "1") == "0":
        return None
    if not _build():
        return None
    lib = ctypes.CDLL(_SO)
    lib.ps_connected_components.restype = ctypes.c_int64
    lib.ps_connected_components.argtypes = [
        ctypes.POINTER(ctypes.c_int8),
        ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int64,
        ctypes.c_int64,
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int32),
    ]
    lib.ps_write_mtx.restype = ctypes.c_int
    lib.ps_write_mtx.argtypes = [
        ctypes.c_char_p,
        ctypes.c_int64,
        ctypes.c_int64,
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_double),
    ]
    lib.ps_write_mtx_vector.restype = ctypes.c_int
    lib.ps_write_mtx_vector.argtypes = [
        ctypes.c_char_p,
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_double),
    ]
    _lib = lib
    return _lib


def _ptr(a, ct):
    return a.ctypes.data_as(ctypes.POINTER(ct))


def connected_components_host(labels: np.ndarray, fwx: np.ndarray, fwy: np.ndarray, fwz: np.ndarray):
    """Union-find CC of REDUCED cells on the host; returns (regions, count)
    or None when the native library is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    labels = np.ascontiguousarray(labels, dtype=np.int8)
    fwx = np.ascontiguousarray(fwx, dtype=np.float32)
    fwy = np.ascontiguousarray(fwy, dtype=np.float32)
    fwz = np.ascontiguousarray(fwz, dtype=np.float32)
    nx, ny, nz = labels.shape
    out = np.empty(labels.shape, dtype=np.int32)
    count = lib.ps_connected_components(
        _ptr(labels, ctypes.c_int8),
        _ptr(fwx, ctypes.c_float),
        _ptr(fwy, ctypes.c_float),
        _ptr(fwz, ctypes.c_float),
        nx,
        ny,
        nz,
        _ptr(out, ctypes.c_int32),
    )
    return out, int(count)


def write_mtx(path: str, m) -> bool:
    """MatrixMarket export of a scipy sparse matrix via the native writer."""
    lib = get_lib()
    if lib is None:
        return False
    coo = m.tocoo()
    rows = np.ascontiguousarray(coo.row, dtype=np.int64)
    cols = np.ascontiguousarray(coo.col, dtype=np.int64)
    vals = np.ascontiguousarray(coo.data, dtype=np.float64)
    rc = lib.ps_write_mtx(
        path.encode(), coo.shape[0], coo.shape[1], coo.nnz,
        _ptr(rows, ctypes.c_int64), _ptr(cols, ctypes.c_int64), _ptr(vals, ctypes.c_double),
    )
    return rc == 0


def write_mtx_vector(path: str, v: np.ndarray) -> bool:
    lib = get_lib()
    if lib is None:
        return False
    v = np.ascontiguousarray(v, dtype=np.float64).ravel()
    return lib.ps_write_mtx_vector(path.encode(), v.size, _ptr(v, ctypes.c_double)) == 0
