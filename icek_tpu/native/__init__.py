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
_RESIZE_SRC = os.path.join(_HERE, "resize.cpp")
_RESIZE_LIB = os.path.join(_HERE, "_resize.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _compile(src: str, lib: str, extra: Sequence[str] = ()) -> Optional[str]:
    # compile to a per-pid temp path then atomically rename: concurrent
    # builders (e.g. forked prep workers racing on a cold cache) each get a
    # complete library instead of a torn write.
    tmp = f"{lib}.{os.getpid()}.tmp"
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", *extra, src,
           "-o", tmp]
    try:
        subprocess.run(cmd, check=True, capture_output=True)
        os.replace(tmp, lib)
        return lib
    except Exception:
        try:
            os.remove(tmp)
        except OSError:
            pass
        return None


def _build() -> Optional[str]:
    return _compile(_SRC, _LIB)


def _fresh(lib: str, src: str) -> bool:
    """lib exists and is newer than its source."""
    try:
        return os.path.getmtime(lib) >= os.path.getmtime(src)
    except OSError:
        return False


def load() -> Optional[ctypes.CDLL]:
    """The shared library, building it if needed; None if unavailable."""
    global _lib, _build_failed
    if _lib is not None or _build_failed:
        return _lib
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        path = _LIB if _fresh(_LIB, _SRC) else _build()
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


# ---------------------------------------------------------------------------
# Native skimage-parity resize (resize.cpp) — the prep pipeline's hot host
# stage.  Bit-identical float16 output vs the scipy path in data/images.py
# (tests/test_native.py); kernels precomputed by the caller with numpy so
# numpy's pairwise-sum normalization is reproduced by construction.

_resize_lock = threading.Lock()
_resize_lib: Optional[ctypes.CDLL] = None
_resize_failed = False

_D = ctypes.POINTER(ctypes.c_double)


def load_resize() -> Optional[ctypes.CDLL]:
    """The resize shared library, building it if needed; None if unavailable."""
    global _resize_lib, _resize_failed
    if _resize_lib is not None or _resize_failed:
        return _resize_lib
    with _resize_lock:
        if _resize_lib is not None or _resize_failed:
            return _resize_lib
        path = (
            _RESIZE_LIB
            if _fresh(_RESIZE_LIB, _RESIZE_SRC)
            # -ffp-contract=off: FMA contraction would change the float64
            # bits vs scipy.  -march=native only vectorizes ACROSS output
            # elements (each lane keeps the scalar op order), so it is
            # bit-safe — and tests/test_native.py would catch any drift.
            else _compile(
                _RESIZE_SRC, _RESIZE_LIB,
                ["-ffp-contract=off", "-march=native"],
            )
            or _compile(_RESIZE_SRC, _RESIZE_LIB, ["-ffp-contract=off"])
        )
        if path is None:
            _resize_failed = True
            return None
        try:
            lib = ctypes.CDLL(path)
        except OSError:
            _resize_failed = True
            return None
        lib.icek_resize_chw_f16.restype = ctypes.c_int
        lib.icek_resize_chw_f16.argtypes = [
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            _D, ctypes.c_int64,
            _D, ctypes.c_int64,
            ctypes.c_int64, ctypes.c_int64,
            ctypes.c_double, ctypes.c_double,
            ctypes.POINTER(ctypes.c_uint16),
        ]
        _resize_lib = lib
        return _resize_lib


def resize_available() -> bool:
    return load_resize() is not None


def _gaussian_kernel(sigma: float) -> np.ndarray:
    """scipy.ndimage's _gaussian_kernel1d (order 0): radius
    int(4*sigma + 0.5), normalized with numpy's own sum so the weights are
    bit-identical to what gaussian_filter uses."""
    radius = int(4.0 * sigma + 0.5)
    x = np.arange(-radius, radius + 1)
    phi = np.exp(-0.5 / (sigma * sigma) * x**2)
    return phi / phi.sum()


def resize_chw_f16(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """(H, W, C) uint8 -> (C, out_h, out_w) float16, the fused
    /255 -> skimage-parity resize -> clip -> CHW -> f16 prep chain.

    Bit-identical to images.resize_like_reference + transpose + astype
    (enforced by tests/test_native.py).  Caller must ensure the library is
    available (resize_available()).
    """
    lib = load_resize()
    assert lib is not None
    assert img.dtype == np.uint8 and img.ndim == 3, (img.dtype, img.shape)
    img = np.ascontiguousarray(img)
    h, w, ch = img.shape
    # anti_aliasing iff any axis downscales; then sigma per axis, and axes
    # with sigma <= 1e-15 are skipped (gaussian_filter's own skip rule).
    fy, fx = h / out_h, w / out_w
    kernels = []
    for f in (fy, fx):
        sigma = max(0.0, (f - 1) / 2) if (fy > 1 or fx > 1) else 0.0
        kernels.append(_gaussian_kernel(sigma) if sigma > 1e-15 else None)
    ky, kx = kernels
    lo = float(img.min()) / 255.0
    hi = float(img.max()) / 255.0
    out = np.empty((ch, out_h, out_w), dtype=np.float16)

    def _kp(k):
        if k is None:
            return None, None, -1
        k = np.ascontiguousarray(k, dtype=np.float64)
        # keep the array alive alongside the raw pointer
        return k, k.ctypes.data_as(_D), len(k) // 2

    ky_arr, kyp, ry = _kp(ky)
    kx_arr, kxp, rx = _kp(kx)
    rc = lib.icek_resize_chw_f16(
        img.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        h, w, ch, kyp, ry, kxp, rx, out_h, out_w, lo, hi,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
    )
    assert rc == 0, rc
    return out
