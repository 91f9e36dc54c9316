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


def test_basic_cost_range_matches_bruteforce():
    """Regression (round-2 review #2): basic-column cost ranges were the
    NEGATION of the true range. Pin against a hand-checkable instance and a
    brute-force scan."""
    # max 2x1 + x2  s.t.  x1 + x2 + s = 1; basis = [x1]: true delta-c_1
    # range is [-1, +inf] (lowering c_1 below 1 makes x2 enter).
    A = np.array([[1.0, 1.0, 1.0]])
    b = np.array([1.0])
    c = np.array([2.0, 1.0, 0.0])
    rng = ranging(A, b, c, np.array([0], np.int32))
    assert rng.c_lo[0] == pytest.approx(-1.0, abs=1e-5)
    assert np.isinf(rng.c_hi[0]) and rng.c_hi[0] > 0

    # brute-force on a random LP: stepping inside the claimed range keeps
    # the basis; stepping beyond a finite bound changes it
    A, b, c = random_dense_lp(6, 16, seed=31)
    res = solve(A, b, c)
    r = ranging(A, b, c, res.basis)
    j = int(res.basis[0])
    for sign, bound in ((+1, r.c_hi[j]), (-1, r.c_lo[j])):
        if not np.isfinite(bound):
            continue
        inside = np.array(c, np.float64)
        inside[j] += 0.9 * bound
        ri = solve(A, b, inside)
        assert sorted(ri.basis.tolist()) == sorted(res.basis.tolist()), (
            "basis changed INSIDE the claimed range"
        )
        outside = np.array(c, np.float64)
        outside[j] += 1.5 * bound + sign * 0.05
        ro = solve(A, b, outside)
        assert sorted(ro.basis.tolist()) != sorted(res.basis.tolist()), (
            "basis unchanged OUTSIDE the claimed range"
        )


def test_ranging_reports_ok_flag():
    """ranging() checks the Newton-Schulz residual (round-2 advisor finding):
    a well-conditioned basis reports ok=True; a numerically singular one
    falls back to the f64 host inverse and, failing that too, ok=False."""
    from simplex_tpu.analysis import ranging

    A = np.array([[1.0, 0.0, 1.0, 0.0], [0.0, 1.0, 0.0, 1.0]])
    b = np.array([2.0, 3.0])
    c = np.array([1.0, 1.0, 0.0, 0.0])
    r = ranging(A, b, c, np.array([0, 1], np.int32))
    assert r.ok

    # exactly singular basis (duplicate column): even the f64 LU fails
    A2 = np.array([[1.0, 1.0, 1.0], [2.0, 2.0, 0.0]])
    r2 = ranging(A2, np.array([1.0, 1.0]), np.zeros(3), np.array([0, 1], np.int32))
    assert not r2.ok
