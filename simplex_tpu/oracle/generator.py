"""Random dense feasible LP generator for tests and benchmarks.

The reference has no generator — it ships one 2x4 sample (``input/sample.txt``)
and relies on externally-converted MPS instances. SURVEY.md §4 mandates
random dense feasible LPs for the automated GLPK-parity harness; this is
that generator.

Construction guarantees:
  * canonical form with a trailing identity slack block (the reference's
    required input shape, ``src/v1_baseline.cu:336-339``),
  * feasible at the slack basis (b > 0),
  * bounded: every structural column is elementwise positive, so no recession
    direction exists in {x >= 0 : Ax = b}.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np


def random_dense_lp(
    m: int,
    n: int,
    seed: int = 0,
    dtype=np.float32,
    degenerate: bool = False,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Generate (A, b, c) with A (m, n) whose last m columns are I.

    ``n`` counts ALL columns including the m slacks (so n > m required).
    ``degenerate=True`` duplicates some b entries and zeroes some costs to
    provoke degenerate pivots (exercises the Bland fallback).
    """
    if n <= m:
        raise ValueError(f"need n > m, got m={m} n={n}")
    rng = np.random.default_rng(seed)
    k = n - m
    A_raw = rng.uniform(0.1, 1.0, size=(m, k))
    A = np.concatenate([A_raw, np.eye(m)], axis=1).astype(dtype)
    b = rng.uniform(1.0, 2.0, size=m).astype(dtype)
    c = np.concatenate(
        [rng.uniform(0.1, 1.0, size=k), np.zeros(m)]
    ).astype(dtype)
    if degenerate:
        b[: m // 2] = b[0]
        c[: max(1, k // 4)] = c[0]
    return A, b, c
