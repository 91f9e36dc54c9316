"""ctypes binding + on-demand build of the native C++ oracle.

The reference keeps its oracle native (GLPK linked C++, solver_glpk.cpp);
here the native piece is our own f64 simplex (oracle/cpp/simplex_oracle.cpp),
compiled once with g++ into a cached shared library and called via ctypes
(no pybind11 in this image).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

from simplex_tpu.oracle.reference import OracleResult
from simplex_tpu.status import SolveStatus

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "cpp", "simplex_oracle.cpp")
_BUILD_DIR = os.path.join(_HERE, "_build")
_LIB = os.path.join(_BUILD_DIR, "libsimplex_oracle.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None

_STATUS_MAP = {
    1: SolveStatus.OPTIMAL,
    2: SolveStatus.UNBOUNDED,
    3: SolveStatus.MAX_ITER,
    4: SolveStatus.SINGULAR,
}


def build(force: bool = False) -> str:
    """Compile the oracle if missing or stale; returns the .so path."""
    os.makedirs(_BUILD_DIR, exist_ok=True)
    if (
        force
        or not os.path.exists(_LIB)
        or os.path.getmtime(_LIB) < os.path.getmtime(_SRC)
    ):
        cmd = [
            "g++", "-O3", "-std=c++17", "-shared", "-fPIC",
            "-o", _LIB, _SRC,
        ]
        subprocess.run(cmd, check=True, capture_output=True, text=True)
    return _LIB


def _load() -> ctypes.CDLL:
    global _lib
    with _lock:
        if _lib is None:
            lib = ctypes.CDLL(build())
            fn = lib.simplex_solve_f64
            fn.restype = ctypes.c_int32
            fn.argtypes = [
                ctypes.POINTER(ctypes.c_double),  # A
                ctypes.POINTER(ctypes.c_double),  # b
                ctypes.POINTER(ctypes.c_double),  # c
                ctypes.c_int32,  # m
                ctypes.c_int32,  # n
                ctypes.c_int32,  # max_iter
                ctypes.POINTER(ctypes.c_int32),  # basis (in/out)
                ctypes.POINTER(ctypes.c_double),  # z out
                ctypes.POINTER(ctypes.c_double),  # x out
                ctypes.POINTER(ctypes.c_int32),  # iters out
            ]
            _lib = lib
    return _lib


def solve_native(A, b, c, basis0=None, max_iter: int = 0) -> OracleResult:
    """Solve max c.x s.t. Ax=b, x>=0 with the native f64 oracle."""
    lib = _load()
    A = np.ascontiguousarray(A, np.float64)
    b = np.ascontiguousarray(b, np.float64)
    c = np.ascontiguousarray(c, np.float64)
    m, n = A.shape
    if basis0 is None:
        basis = np.arange(n - m, n, dtype=np.int32)
    else:
        basis = np.ascontiguousarray(basis0, np.int32).copy()
    if max_iter <= 0:
        max_iter = 50 * (m + n)
    z = ctypes.c_double(0.0)
    x = np.zeros(n, np.float64)
    iters = ctypes.c_int32(0)

    def ptr(arr, typ):
        return arr.ctypes.data_as(ctypes.POINTER(typ))

    code = lib.simplex_solve_f64(
        ptr(A, ctypes.c_double), ptr(b, ctypes.c_double), ptr(c, ctypes.c_double),
        m, n, max_iter,
        ptr(basis, ctypes.c_int32), ctypes.byref(z), ptr(x, ctypes.c_double),
        ctypes.byref(iters),
    )
    status = _STATUS_MAP.get(int(code), SolveStatus.SINGULAR)
    if status == SolveStatus.OPTIMAL:
        return OracleResult(z=float(z.value), x=x, status=status)
    return OracleResult(z=None, x=None, status=status)
