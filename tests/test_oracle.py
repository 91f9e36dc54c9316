"""Native C++ oracle: builds, solves, agrees with scipy and with our solver."""

import numpy as np
import pytest

from simplex_tpu import solve
from simplex_tpu.oracle.generator import random_dense_lp
from simplex_tpu.oracle.native import solve_native
from simplex_tpu.oracle.reference import relative_gap, solve_scipy
from simplex_tpu.status import SolveStatus


def test_native_oracle_golden():
    A = np.array([[1.0, 1, 1, 0], [2, 1, 0, 1]])
    b = np.array([4.0, 5])
    c = np.array([3.0, 2, 0, 0])
    res = solve_native(A, b, c)
    assert res.status == SolveStatus.OPTIMAL
    assert res.z == pytest.approx(9.0, abs=1e-12)
    np.testing.assert_allclose(res.x, [1, 3, 0, 0], atol=1e-12)


@pytest.mark.parametrize("m,n,seed", [(8, 20, 0), (32, 80, 1), (64, 160, 2)])
def test_native_matches_scipy(m, n, seed):
    A, b, c = random_dense_lp(m, n, seed=seed, dtype=np.float64)
    ref = solve_scipy(A, b, c)
    res = solve_native(A, b, c)
    assert res.status == SolveStatus.OPTIMAL
    assert relative_gap(res.z, ref.z) < 1e-9


def test_native_unbounded():
    A = np.array([[-1.0, 1.0, 1.0]])
    b = np.array([1.0])
    c = np.array([1.0, 0.0, 0.0])
    res = solve_native(A, b, c)
    assert res.status == SolveStatus.UNBOUNDED


def test_tpu_solver_vs_native_oracle():
    A, b, c = random_dense_lp(48, 120, seed=7)
    ref = solve_native(A, b, c)
    res = solve(A, b, c)
    assert res.status == ref.status == SolveStatus.OPTIMAL
    assert relative_gap(res.z, ref.z) < 1e-5
