"""Sensitivity ranging vs brute-force re-solves."""

import numpy as np
import pytest

from simplex_tpu.analysis import ranging
from simplex_tpu.core.solver import solve
from simplex_tpu.oracle.generator import random_dense_lp
from simplex_tpu.oracle.reference import solve_scipy
from simplex_tpu.status import SolveStatus


@pytest.fixture(scope="module")
def solved():
    A, b, c = random_dense_lp(10, 28, seed=23)
    res = solve(A, b, c)
    assert res.status == SolveStatus.OPTIMAL
    rng = ranging(A, b, c, res.basis)
    return A, b, c, res, rng


def test_rhs_rate_is_dual(solved):
    """Inside the RHS range, dz/db_i == y_i: re-solve with a small step and
    compare objectives."""
    A, b, c, res, rng = solved
    for i in range(3):
        step = min(0.1, 0.5 * rng.b_hi[i]) if rng.b_hi[i] > 1e-6 else 0.0
        if step == 0.0:
            continue
        b2 = np.array(b, np.float64).copy()
        b2[i] += step
        r2 = solve_scipy(A, b2, c)
        assert r2.status == SolveStatus.OPTIMAL
        assert abs((r2.z - res.z) - rng.y[i] * step) < 1e-5 * max(1, abs(res.z))


def test_rhs_range_boundary_changes_basis(solved):
    """Stepping OUTSIDE a finite RHS range must change the optimal basis
    (or make the instance infeasible)."""
    A, b, c, res, rng = solved
    fin = [i for i in range(len(b)) if np.isfinite(rng.b_hi[i]) and rng.b_hi[i] < 10]
    if not fin:
        pytest.skip("no finite upper RHS range in this instance")
    i = fin[0]
    b2 = np.array(b, np.float64).copy()
    b2[i] += rng.b_hi[i] * 1.5 + 0.1
    r2 = solve(A, b2, c)
    if r2.status == SolveStatus.OPTIMAL:
        assert sorted(r2.basis.tolist()) != sorted(res.basis.tolist())


def test_cost_rate_is_primal(solved):
    """Inside the cost range, dz/dc_j == x_j."""
    A, b, c, res, rng = solved
    j = int(res.basis[0])  # a basic column: nonzero rate
    step = min(0.05, 0.5 * float(rng.c_hi[j])) if rng.c_hi[j] > 1e-6 else 0.0
    if step == 0.0:
        pytest.skip("degenerate cost range")
    c2 = np.array(c, np.float64).copy()
    c2[j] += step
    r2 = solve_scipy(A, b, c2)
    assert abs((r2.z - res.z) - rng.x[j] * step) < 1e-5 * max(1, abs(res.z))


def test_nonbasic_cost_hi_is_reduced_cost(solved):
    """A nonbasic column's allowable cost increase equals its reduced-cost
    slack y.A_j - c_j, and raising it further brings the column into the
    optimal solution."""
    A, b, c, res, rng = solved
    nonbasic = [j for j in range(len(c)) if j not in set(res.basis.tolist())]
    j = nonbasic[0]
    slack = float(res.y @ np.asarray(A)[:, j] - c[j])
    assert rng.c_hi[j] == pytest.approx(slack, abs=1e-4)
    c2 = np.array(c, np.float64).copy()
    c2[j] += slack + 0.05
    r2 = solve_scipy(A, b, c2)
    assert r2.status == SolveStatus.OPTIMAL
    assert r2.x[j] > 1e-9  # the column entered
