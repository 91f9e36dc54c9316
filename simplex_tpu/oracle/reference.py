"""Correctness oracles.

The reference uses GLPK as its (manual) oracle (``solver_glpk.cpp:23-36``).
GLPK is not available in this image, so the framework provides two
independent oracles and an automated parity harness (SURVEY.md §4):

  * scipy's HiGHS via ``linprog`` (battle-tested LP solver, double precision),
  * a from-scratch C++ double-precision revised simplex
    (:mod:`simplex_tpu.oracle.native`), filling the reference's
    native-oracle role.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import numpy as np

from simplex_tpu.status import SolveStatus


class OracleResult(NamedTuple):
    z: Optional[float]
    x: Optional[np.ndarray]
    status: SolveStatus


def solve_scipy(A, b, c) -> OracleResult:
    """Solve max c.x s.t. Ax=b, x>=0 with scipy/HiGHS (minimizes, so negate)."""
    from scipy.optimize import linprog

    A = np.asarray(A, np.float64)
    b = np.asarray(b, np.float64)
    c = np.asarray(c, np.float64)
    res = linprog(-c, A_eq=A, b_eq=b, bounds=(0, None), method="highs")
    if res.status == 0:
        return OracleResult(z=float(-res.fun), x=res.x, status=SolveStatus.OPTIMAL)
    if res.status == 3:
        return OracleResult(z=None, x=None, status=SolveStatus.UNBOUNDED)
    return OracleResult(z=None, x=None, status=SolveStatus.SINGULAR)


def relative_gap(z: float, z_ref: float) -> float:
    """|z - z_ref| / max(1, |z_ref|) — the BASELINE.json 1e-6 parity metric."""
    return abs(z - z_ref) / max(1.0, abs(z_ref))
