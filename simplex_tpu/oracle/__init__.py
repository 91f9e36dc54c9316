"""Correctness oracles and problem generators (SURVEY.md §4).

Two independent oracles back the automated parity harness:
  * ``scipy`` — HiGHS via scipy.optimize.linprog (double precision)
  * ``native`` — our from-scratch C++ f64 simplex (ctypes, built on demand),
    the stand-in for the reference's GLPK path (solver_glpk.cpp)
"""

from simplex_tpu.oracle.generator import random_dense_lp
from simplex_tpu.oracle.reference import OracleResult, relative_gap, solve_scipy


def get_oracle(name: str):
    if name == "scipy":
        return solve_scipy
    if name == "native":
        from simplex_tpu.oracle.native import solve_native

        return solve_native
    raise ValueError(f"unknown oracle {name!r} (want 'scipy' or 'native')")


__all__ = [
    "OracleResult",
    "get_oracle",
    "random_dense_lp",
    "relative_gap",
    "solve_scipy",
]
