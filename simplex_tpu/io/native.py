"""ctypes binding for the native text loader (io/cpp/fast_loader.cpp).

``load_lp_fast`` is a drop-in for :func:`simplex_tpu.io.text.load_lp` that
mmaps + strtof-parses directly into numpy buffers — the native data-loader
counterpart to the reference's iostream parse (src/v1_baseline.cu:93-103).
Falls back to the pure-Python loader if the toolchain is unavailable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "cpp", "fast_loader.cpp")
_BUILD_DIR = os.path.join(_HERE, "_build")
_LIB = os.path.join(_BUILD_DIR, "libfast_loader.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        try:
            os.makedirs(_BUILD_DIR, exist_ok=True)
            if (
                not os.path.exists(_LIB)
                or os.path.getmtime(_LIB) < os.path.getmtime(_SRC)
            ):
                subprocess.run(
                    ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-o", _LIB, _SRC],
                    check=True,
                    capture_output=True,
                )
            lib = ctypes.CDLL(_LIB)
            lib.lp_text_header.restype = ctypes.c_int32
            lib.lp_text_header.argtypes = [
                ctypes.c_char_p,
                ctypes.POINTER(ctypes.c_int64),
                ctypes.POINTER(ctypes.c_int64),
            ]
            lib.lp_text_load_f32.restype = ctypes.c_int32
            lib.lp_text_load_f32.argtypes = [
                ctypes.c_char_p, ctypes.c_int64, ctypes.c_int64,
                ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
                ctypes.POINTER(ctypes.c_float),
            ]
            lib.lp_text_save_f32.restype = ctypes.c_int32
            lib.lp_text_save_f32.argtypes = [
                ctypes.c_char_p, ctypes.c_int64, ctypes.c_int64,
                ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
                ctypes.POINTER(ctypes.c_float),
            ]
            _lib = lib
        except (subprocess.CalledProcessError, OSError):
            _build_failed = True
    return _lib


def _fptr(arr):
    return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def load_lp_fast(path) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Native load of the reference text format (fp32). Falls back to the
    Python parser when the native library can't be built."""
    lib = _load()
    path = os.fspath(path)
    if lib is None:
        from simplex_tpu.io.text import load_lp

        return load_lp(path)
    m64, n64 = ctypes.c_int64(0), ctypes.c_int64(0)
    rc = lib.lp_text_header(path.encode(), ctypes.byref(m64), ctypes.byref(n64))
    if rc != 0:
        raise ValueError(f"{path}: bad LP text header (native rc={rc})")
    m, n = m64.value, n64.value
    A = np.empty((m, n), np.float32)
    b = np.empty(m, np.float32)
    c = np.empty(n, np.float32)
    rc = lib.lp_text_load_f32(path.encode(), m, n, _fptr(A), _fptr(b), _fptr(c))
    if rc != 0:
        raise ValueError(f"{path}: LP text parse failed (native rc={rc})")
    return A, b, c


def save_lp_fast(path, A, b, c) -> None:
    lib = _load()
    A = np.ascontiguousarray(A, np.float32)
    b = np.ascontiguousarray(b, np.float32)
    c = np.ascontiguousarray(c, np.float32)
    if lib is None:
        from simplex_tpu.io.text import save_lp

        save_lp(path, A, b, c)
        return
    m, n = A.shape
    rc = lib.lp_text_save_f32(
        os.fspath(path).encode(), m, n, _fptr(A), _fptr(b), _fptr(c)
    )
    if rc != 0:
        raise OSError(f"{path}: native save failed (rc={rc})")
