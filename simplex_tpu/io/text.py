"""Reference text format: ``m n``, then A (m x n), b (m), c (n), whitespace
separated (documented inline in the reference's ``input/sample.txt:7-13``,
parsed by ``load_matrix_impl`` ``src/v1_baseline.cu:93-103``).

The reference stores column-major for cuBLAS; JAX arrays are row-major and
XLA picks layouts itself, so we keep natural (m, n) row-major arrays.

A native C++ fast loader for large instances lives in
``simplex_tpu/oracle/cpp`` (see :mod:`simplex_tpu.io.native`); this module is
the always-available pure-Python path.
"""

from __future__ import annotations

import io
import os
from typing import Tuple

import numpy as np


def loads_lp(text: str, dtype=np.float32) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Parse the text format from a string. Returns (A, b, c)."""
    tokens = text.split()
    if len(tokens) < 2:
        raise ValueError("LP text: missing header 'm n'")
    m, n = int(tokens[0]), int(tokens[1])
    if m > n:
        # same rejection as the reference main (src/v1_baseline.cu:467)
        raise ValueError(f"LP text: m > n ({m} > {n})")
    need = 2 + m * n + m + n
    if len(tokens) < need:
        raise ValueError(f"LP text: expected {need} tokens, got {len(tokens)}")
    vals = np.asarray(tokens[2:need], dtype=np.float64)
    A = vals[: m * n].reshape(m, n).astype(dtype)
    b = vals[m * n : m * n + m].astype(dtype)
    c = vals[m * n + m :].astype(dtype)
    return A, b, c


def load_lp(path: str | os.PathLike, dtype=np.float32):
    """Load (A, b, c) from a file in the reference text format.

    Trailing free-text (the sample file's 'Explanation:' block) is tolerated:
    only the first 2 + m*n + m + n numeric-position tokens are consumed...
    except the reference's sample places prose *after* all numbers, so a
    plain greedy parse of the leading tokens suffices.
    """
    with open(path, "r") as f:
        text = f.read()
    # Cut at the first token that is not numeric once past the header — the
    # sample file ends with a prose explanation block.
    tokens = text.split()
    if len(tokens) < 2:
        raise ValueError(f"{path}: missing header")
    m, n = int(tokens[0]), int(tokens[1])
    need = 2 + m * n + m + n
    return loads_lp(" ".join(tokens[:need]), dtype=dtype)


def dumps_lp(A: np.ndarray, b: np.ndarray, c: np.ndarray) -> str:
    """Write (A, b, c) in the reference text format (the fixed version of the
    reference converter's `output_lp`, whose header lacked a separator —
    glpk_interface.cpp:83)."""
    m, n = A.shape
    buf = io.StringIO()
    buf.write(f"{m} {n}\n")
    for row in np.asarray(A):
        buf.write(" ".join(repr(float(v)) for v in row))
        buf.write("\n")
    buf.write(" ".join(repr(float(v)) for v in np.asarray(b)))
    buf.write("\n")
    buf.write(" ".join(repr(float(v)) for v in np.asarray(c)))
    buf.write("\n")
    return buf.getvalue()


def save_lp(path: str | os.PathLike, A, b, c) -> None:
    with open(path, "w") as f:
        f.write(dumps_lp(np.asarray(A), np.asarray(b), np.asarray(c)))


def loads_lp_thesis(text: str, dtype=np.float32):
    """Parse the thesis archive's field order: ``M N``, then c (n), b (m),
    A (m x n) — the reference's historical origin used this layout
    (``archive/thesis/cpu/lpsolver.c:74-82``; note it differs from the
    active ``src/`` order ``m n, A, b, c``). Returns (A, b, c)."""
    tokens = text.split()
    if len(tokens) < 2:
        raise ValueError("LP text (thesis order): missing header 'M N'")
    m, n = int(tokens[0]), int(tokens[1])
    need = 2 + n + m + m * n
    if len(tokens) < need:
        raise ValueError(
            f"LP text (thesis order): expected {need} tokens, got {len(tokens)}"
        )
    vals = np.asarray(tokens[2:need], dtype=np.float64)
    c = vals[:n].astype(dtype)
    b = vals[n : n + m].astype(dtype)
    A = vals[n + m :].reshape(m, n).astype(dtype)
    return A, b, c


def load_lp_thesis(path: str | os.PathLike, dtype=np.float32):
    """Load (A, b, c) from a file in the thesis archive's field order."""
    with open(path, "r") as f:
        return loads_lp_thesis(f.read(), dtype=dtype)
