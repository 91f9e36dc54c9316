"""Two-phase solver on general-form LPs (>= / = rows, negative b) vs scipy."""

import jax.numpy as jnp
import numpy as np
import pytest
from scipy.optimize import linprog

from simplex_tpu.config import SimplexOptions
from simplex_tpu.core.twophase import GeneralLP, solve_general
from simplex_tpu.status import SolveStatus

F64 = SimplexOptions(dtype=jnp.float64)


def scipy_general(lp: GeneralLP):
    A_ub, b_ub, A_eq, b_eq = [], [], [], []
    for i, t in enumerate(lp.row_types):
        if t == "L":
            A_ub.append(lp.A[i]); b_ub.append(lp.b[i])
        elif t == "G":
            A_ub.append(-lp.A[i]); b_ub.append(-lp.b[i])
        else:
            A_eq.append(lp.A[i]); b_eq.append(lp.b[i])
    res = linprog(
        -np.asarray(lp.c),
        A_ub=np.asarray(A_ub) if A_ub else None,
        b_ub=np.asarray(b_ub) if b_ub else None,
        A_eq=np.asarray(A_eq) if A_eq else None,
        b_eq=np.asarray(b_eq) if b_eq else None,
        bounds=(0, None),
        method="highs",
    )
    return res


def test_mixed_rows():
    lp = GeneralLP(
        A=np.array([[1.0, 1.0], [1.0, 0.0], [0.0, 1.0]]),
        b=np.array([10.0, 2.0, 3.0]),
        c=np.array([1.0, 1.0]),
        row_types=["L", "G", "E"],
    )
    ref = scipy_general(lp)
    res = solve_general(lp, options=F64)
    assert res.status == SolveStatus.OPTIMAL
    assert res.z == pytest.approx(-ref.fun, rel=1e-9)


def test_negative_rhs():
    # -x0 - x1 <= -2  (i.e. x0 + x1 >= 2), minimize-ish objective
    lp = GeneralLP(
        A=np.array([[-1.0, -1.0], [1.0, 2.0]]),
        b=np.array([-2.0, 10.0]),
        c=np.array([-1.0, -0.5]),
        row_types=["L", "L"],
    )
    ref = scipy_general(lp)
    res = solve_general(lp, options=F64)
    assert res.status == SolveStatus.OPTIMAL
    assert res.z == pytest.approx(-ref.fun, rel=1e-9)


def test_infeasible_detected():
    lp = GeneralLP(
        A=np.array([[1.0, 1.0], [1.0, 1.0]]),
        b=np.array([1.0, 3.0]),
        c=np.array([1.0, 1.0]),
        row_types=["L", "G"],  # x0+x1 <= 1 AND >= 3
    )
    res = solve_general(lp, options=F64)
    assert res.status == SolveStatus.INFEASIBLE


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_random_general_lps(seed):
    rng = np.random.default_rng(seed)
    m, k = 8, 14
    A = rng.uniform(-1, 1, (m, k))
    x_feas = rng.uniform(0.1, 1.0, k)  # plant a feasible point
    types = [rng.choice(["L", "G", "E"]) for _ in range(m)]
    b = A @ x_feas
    slack = rng.uniform(0.1, 0.5, m)
    b = np.where([t == "L" for t in types], b + slack, b)
    b = np.where([t == "G" for t in types], b - slack, b)
    c = -rng.uniform(0.1, 1.0, k)  # negative costs => bounded
    lp = GeneralLP(A=A, b=b, c=c, row_types=types)
    ref = scipy_general(lp)
    assert ref.status == 0
    res = solve_general(lp, options=F64)
    assert res.status == SolveStatus.OPTIMAL
    assert res.z == pytest.approx(-ref.fun, rel=1e-7, abs=1e-9)


def test_equality_only():
    lp = GeneralLP(
        A=np.array([[1.0, 1.0, 1.0]]),
        b=np.array([1.0]),
        c=np.array([2.0, 1.0, 0.0]),
        row_types=["E"],
    )
    res = solve_general(lp, options=F64)
    assert res.status == SolveStatus.OPTIMAL
    assert res.z == pytest.approx(2.0, abs=1e-9)
    np.testing.assert_allclose(res.x, [1, 0, 0], atol=1e-9)
