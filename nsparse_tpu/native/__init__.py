"""Native (C++) runtime components, loaded via ctypes.

The reference's host runtime is C/CUDA host code (file parsing, format
conversion bookkeeping).  The TPU rebuild keeps the device path in
JAX/XLA/Pallas and puts the genuinely host-bound work — large Matrix Market
parsing — in C++ (``mmio.cpp``), built on demand into ``libnsparse_native.so``
and loaded through ctypes.  Everything has a NumPy fallback so the library
works without a compiler.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_HERE, "libnsparse_native.so")
_lock = threading.Lock()
_lib = None
_build_failed = False


def _build() -> bool:
    src = os.path.join(_HERE, "mmio.cpp")
    if not os.path.exists(src):
        return False
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
        "-o", _LIB_PATH, src,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def get_lib():
    """Load (building if needed) the native library, or None."""
    global _lib, _build_failed
    if _lib is not None:
        return _lib
    if _build_failed or os.environ.get("NSPARSE_TPU_NO_NATIVE"):
        return None
    with _lock:
        if _lib is not None:
            return _lib
        if not os.path.exists(_LIB_PATH) or (
            os.path.exists(os.path.join(_HERE, "mmio.cpp"))
            and os.path.getmtime(os.path.join(_HERE, "mmio.cpp"))
            > os.path.getmtime(_LIB_PATH)
        ):
            if not _build():
                _build_failed = True
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            _build_failed = True
            return None
        lib.nsp_read_mtx.restype = ctypes.c_int64
        lib.nsp_read_mtx.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int64),  # m
            ctypes.POINTER(ctypes.c_int64),  # n
            ctypes.POINTER(ctypes.c_int64),  # nnz out (after symmetrize)
        ]
        lib.nsp_fill_mtx.restype = ctypes.c_int
        lib.nsp_fill_mtx.argtypes = [
            np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
        ]
        lib.nsp_free_mtx.restype = None
        lib.nsp_free_mtx.argtypes = []
        _lib = lib
        return _lib


def try_native_read_mtx(path: str):
    """Fast C++ .mtx parse; returns (rows, cols, vals, (m, n)) or None."""
    lib = get_lib()
    if lib is None:
        return None
    m = ctypes.c_int64()
    n = ctypes.c_int64()
    nnz = ctypes.c_int64()
    rc = lib.nsp_read_mtx(path.encode(), ctypes.byref(m), ctypes.byref(n), ctypes.byref(nnz))
    if rc < 0:
        return None
    rows = np.empty(nnz.value, dtype=np.int64)
    cols = np.empty(nnz.value, dtype=np.int64)
    vals = np.empty(nnz.value, dtype=np.float64)
    if nnz.value:
        lib.nsp_fill_mtx(rows, cols, vals)
    lib.nsp_free_mtx()
    return rows, cols, vals, (m.value, n.value)
