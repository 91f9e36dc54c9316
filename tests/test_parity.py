"""Oracle parity harness: random dense feasible LPs solved by simplex_tpu must
match scipy/HiGHS objectives to the BASELINE.json gate (1e-6 relative gap).

This automates the reference's manual GLPK comparison workflow
(`solver_glpk.cpp` + eyeballing; SURVEY.md §4 point 2).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from simplex_tpu import SimplexOptions, SolveStatus, solve
from simplex_tpu.oracle.generator import random_dense_lp
from simplex_tpu.oracle.reference import relative_gap, solve_scipy

SIZES = [(4, 10), (16, 40), (48, 120), (96, 240)]


@pytest.mark.parametrize("m,n", SIZES)
@pytest.mark.parametrize("seed", [0, 1, 2])
def test_parity_fp64(m, n, seed):
    A, b, c = random_dense_lp(m, n, seed=seed, dtype=np.float64)
    ref = solve_scipy(A, b, c)
    assert ref.status == SolveStatus.OPTIMAL
    res = solve(A, b, c, options=SimplexOptions(dtype=jnp.float64))
    assert res.status == SolveStatus.OPTIMAL
    assert relative_gap(res.z, ref.z) < 1e-9
    # primal feasibility of the returned solution
    np.testing.assert_allclose(A @ res.x, b, atol=1e-8)
    assert np.all(res.x >= -1e-9)


@pytest.mark.parametrize("m,n", SIZES)
def test_parity_fp32(m, n):
    A, b, c = random_dense_lp(m, n, seed=7, dtype=np.float32)
    ref = solve_scipy(A, b, c)
    res = solve(A, b, c, options=SimplexOptions(refactor_every=64))
    assert res.status == SolveStatus.OPTIMAL
    assert relative_gap(res.z, ref.z) < 1e-5


def test_parity_degenerate_with_bland_fallback():
    A, b, c = random_dense_lp(24, 60, seed=11, dtype=np.float64, degenerate=True)
    ref = solve_scipy(A, b, c)
    res = solve(A, b, c, options=SimplexOptions(dtype=jnp.float64, bland_after=8))
    assert res.status == SolveStatus.OPTIMAL
    assert relative_gap(res.z, ref.z) < 1e-9


def test_parity_medium_fp32_with_refactor():
    # fp32 product-form drifts; periodic refactorization must hold the gate.
    A, b, c = random_dense_lp(192, 512, seed=3, dtype=np.float32)
    ref = solve_scipy(A, b, c)
    res = solve(A, b, c, options=SimplexOptions(refactor_every=100))
    assert res.status == SolveStatus.OPTIMAL
    assert relative_gap(res.z, ref.z) < 1e-4


def test_duals_match_highs():
    """SolveResult.y: simplex multipliers satisfy strong duality and match
    HiGHS's equality marginals (up to sign convention)."""
    import numpy as np
    from scipy.optimize import linprog

    from simplex_tpu.core.solver import solve
    from simplex_tpu.oracle.generator import random_dense_lp

    A, b, c = random_dense_lp(32, 96, seed=17)
    res = solve(A, b, c)
    assert res.y is not None and res.y.shape == (32,)
    # strong duality: z == y.b
    assert abs(float(np.dot(res.y, b)) - res.z) < 1e-4 * max(1, abs(res.z))
    # dual feasibility: reduced costs y.A - c >= -tol
    red = res.y @ np.asarray(A) - np.asarray(c)
    assert red.min() > -1e-3
    # vs HiGHS marginals (linprog minimizes -c, so marginals are -y)
    ref = linprog(
        -np.asarray(c, np.float64), A_eq=np.asarray(A, np.float64),
        b_eq=np.asarray(b, np.float64), bounds=(0, None), method="highs",
    )
    np.testing.assert_allclose(res.y, -ref.eqlin.marginals, atol=1e-3)
