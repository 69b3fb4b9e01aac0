"""Native (C++) helpers for the host-side data pipeline.

Builds ``fuzzy_match.cpp`` into a shared library on first use (g++ -O3) and
exposes it through ctypes.  Everything degrades gracefully to the pure-
Python implementations in ``icek_tpu.data.context`` when no compiler is
available — the native path is a throughput optimization, not a semantic
dependency (parity enforced by tests/test_native.py).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Sequence

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "fuzzy_match.cpp")
_LIB = os.path.join(_HERE, "_fuzzy_match.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _build() -> Optional[str]:
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", _LIB]
    try:
        subprocess.run(cmd, check=True, capture_output=True)
        return _LIB
    except Exception:
        return None


def load() -> Optional[ctypes.CDLL]:
    """The shared library, building it if needed; None if unavailable."""
    global _lib, _build_failed
    if _lib is not None or _build_failed:
        return _lib
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        path = _LIB if os.path.exists(_LIB) else _build()
        if path is None:
            _build_failed = True
            return None
        try:
            lib = ctypes.CDLL(path)
        except OSError:
            _build_failed = True
            return None
        lib.icek_fuzzy_lookup.restype = ctypes.c_int64
        lib.icek_fuzzy_lookup.argtypes = [
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int64,
            ctypes.c_int32,
        ]
        lib.icek_fuzzy_lookup_batch.restype = None
        lib.icek_fuzzy_lookup_batch.argtypes = [
            ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int64,
            ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int64),
        ]
        _lib = lib
        return _lib


def fuzzy_lookup(
    query: Sequence[int],
    keys: np.ndarray,                      # (n_keys, 50) int32
    allowed: Optional[np.ndarray] = None,  # (n_keys,) uint8
    pad: int = 124,
) -> int:
    """Longest fuzzy match row or -1 (native path)."""
    lib = load()
    assert lib is not None
    q = np.ascontiguousarray(query, dtype=np.int32)
    k = np.ascontiguousarray(keys, dtype=np.int32)
    a_ptr = None
    if allowed is not None:
        allowed = np.ascontiguousarray(allowed, dtype=np.uint8)
        a_ptr = allowed.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
    return int(
        lib.icek_fuzzy_lookup(
            q.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            k.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            a_ptr,
            len(k),
            pad,
        )
    )


def available() -> bool:
    return load() is not None
