"""Lazy-built native host kernels (C++ via ctypes, pure-Python fallback).

The device hot path is XLA-compiled; this package covers the host-side
loops that would otherwise run interpreted: the deterministic factor walk
and the PAVA isotonic fit. Built on first use with g++ -O3 into the package
directory; any build/load failure falls back silently to the Python
implementations (same results, slower at large max_n).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False

_SRC = os.path.join(os.path.dirname(__file__), "hostkernels.cpp")
_SO = os.path.join(os.path.dirname(__file__), "_hostkernels.so")


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    with _LOCK:
        if _TRIED:
            return _LIB
        _TRIED = True
        try:
            if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(
                _SRC
            ):
                subprocess.run(
                    ["g++", "-O3", "-shared", "-fPIC", "-o", _SO, _SRC],
                    check=True,
                    capture_output=True,
                    timeout=120,
                )
            lib = ctypes.CDLL(_SO)
            lib.mcp_fixed_alloc.argtypes = [
                ctypes.POINTER(ctypes.c_double),
                ctypes.c_int32,
                ctypes.c_int64,
                ctypes.POINTER(ctypes.c_int32),
            ]
            lib.mcp_pava.argtypes = [
                ctypes.POINTER(ctypes.c_double),
                ctypes.c_int64,
                ctypes.POINTER(ctypes.c_double),
            ]
            _LIB = lib
        except Exception:
            _LIB = None
        return _LIB


def fixed_alloc(probs, n: int) -> Optional[np.ndarray]:
    """Native largest-remainder walk; None if the library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    p = np.ascontiguousarray(probs, dtype=np.float64)
    out = np.empty(n, dtype=np.int32)
    lib.mcp_fixed_alloc(
        p.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        ctypes.c_int32(len(p)),
        ctypes.c_int64(n),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    return out


def pava(y) -> Optional[np.ndarray]:
    """Native isotonic fit; None if the library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    yy = np.ascontiguousarray(y, dtype=np.float64)
    out = np.empty_like(yy)
    lib.mcp_pava(
        yy.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        ctypes.c_int64(len(yy)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
    )
    return out
