"""Presolve reductions + scaling: equivalence vs the unpresolved route.

The reference has no presolve (``glpk_interface.cpp:16-78`` feeds raw MPS
data to the solver); these tests pin the reduction semantics and prove the
presolved path returns the SAME answer — z, x, and duals — as the
unreduced general route, with KKT checked directly on the recovered duals.
"""

import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sps

from simplex_tpu.config import SimplexOptions
from simplex_tpu.core.twophase import GeneralLP, solve_general
from simplex_tpu.presolve import presolve, postsolve
from simplex_tpu.status import SolveStatus

F64 = SimplexOptions(dtype=jnp.float64)


def planted_lp(seed: int, *, sparse: bool = False) -> GeneralLP:
    """Random bounded-feasible general LP with planted presolvable junk:
    a fixed variable, a zero column, a zero row, and two singleton rows."""
    rng = np.random.default_rng(seed)
    m, k = 10, 15
    A = rng.uniform(-1, 1, (m, k))
    types = [str(t) for t in rng.choice(["L", "G", "E"], m)]
    A[:, 3] = 0.0                      # empty column
    A[6, :] = 0.0                      # empty row
    types[6] = "L"
    A[7, :] = 0.0                      # singleton L row: x_2 <= 0.8
    A[7, 2] = 2.0
    types[7] = "L"
    A[8, :] = 0.0                      # singleton G row: x_5 >= 0.2
    A[8, 5] = 1.0
    types[8] = "G"
    x_feas = rng.uniform(0.25, 0.75, k)
    lo = np.zeros(k)
    up = np.full(k, np.inf)
    up[:8] = 1.5                       # finite uppers keep it bounded
    up[2] = 1.0
    lo[4] = up[4] = 0.5                # fixed variable
    x_feas[4] = 0.5
    b = A @ x_feas
    slack = rng.uniform(0.05, 0.3, m)
    b = np.where([t == "L" for t in types], b + slack, b)
    b = np.where([t == "G" for t in types], b - slack, b)
    b[6] = 1.0                         # feasible constant row
    b[7] = 2.0 * 0.8
    b[8] = 0.2
    c = rng.uniform(-1.0, 1.0, k)
    c[3] = -0.7                        # empty col parks at lower bound 0
    Am = sps.csc_matrix(A) if sparse else A
    return GeneralLP(A=Am, b=b, c=c, row_types=types, lower=lo, upper=up)


def kkt_check(lp: GeneralLP, x, y, *, tol=1e-6):
    """Stationarity + dual signs + complementary slackness (maximize)."""
    A = lp.A.toarray() if sps.issparse(lp.A) else np.asarray(lp.A)
    k = A.shape[1]
    lo = np.zeros(k) if lp.lower is None else np.asarray(lp.lower)
    up = np.full(k, np.inf) if lp.upper is None else np.asarray(lp.upper)
    rc = np.asarray(lp.c) - A.T @ y
    r = A @ x - np.asarray(lp.b)
    for i, t in enumerate(lp.row_types):
        if t == "L":
            assert r[i] <= tol, f"row {i} violated"
            assert y[i] >= -tol, f"L-row dual sign, y[{i}]={y[i]}"
            assert abs(y[i] * r[i]) <= 1e-5, f"CS fails at row {i}"
        elif t == "G":
            assert r[i] >= -tol
            assert y[i] <= tol, f"G-row dual sign, y[{i}]={y[i]}"
            assert abs(y[i] * r[i]) <= 1e-5
        else:
            assert abs(r[i]) <= tol
    for j in range(k):
        at_lo = x[j] <= lo[j] + 1e-7
        at_up = np.isfinite(up[j]) and x[j] >= up[j] - 1e-7
        if not at_lo and not at_up:
            assert abs(rc[j]) <= 1e-5, f"interior var {j} has rc={rc[j]}"
        elif at_lo and not at_up:
            assert rc[j] <= 1e-5, f"at-lower var {j} has rc={rc[j]} > 0"
        elif at_up and not at_lo:
            assert rc[j] >= -1e-5, f"at-upper var {j} has rc={rc[j]} < 0"


@pytest.mark.parametrize("sparse", [False, True], ids=["dense", "sparse"])
def test_planted_reductions_counted(sparse):
    lp = planted_lp(0, sparse=sparse)
    pr = presolve(lp)
    assert pr.lp is not None
    m_red, k_red = pr.lp.A.shape
    assert m_red <= lp.A.shape[0] - 3     # empty + 2 singletons gone
    assert k_red <= lp.A.shape[1] - 2     # fixed + empty col gone
    assert sps.issparse(pr.lp.A) == sparse


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("sparse", [False, True], ids=["dense", "sparse"])
def test_presolved_matches_plain_route(seed, sparse):
    lp = planted_lp(seed, sparse=sparse)
    plain = solve_general(lp, options=F64)
    pres = solve_general(lp, options=F64, presolve=True)
    assert plain.status == SolveStatus.OPTIMAL
    assert pres.status == SolveStatus.OPTIMAL
    assert pres.z == pytest.approx(plain.z, rel=1e-8, abs=1e-9)
    # planted instances are nondegenerate w.h.p.: the vertex is unique
    np.testing.assert_allclose(pres.x, plain.x, atol=1e-6)
    assert pres.y is not None
    kkt_check(lp, pres.x, pres.y)
    # fixed variable recovered exactly; iters strictly fewer rows/cols seen
    assert pres.x[4] == pytest.approx(0.5, abs=1e-12)


def test_scaling_rescues_fp32_on_badly_scaled_instance():
    """Rows spanning 8 orders of magnitude: the f64 route is the oracle;
    presolve's geometric-mean equilibration must keep fp32 at parity."""
    lp0 = planted_lp(3)
    rs = np.logspace(-4, 4, lp0.A.shape[0])
    lp = GeneralLP(A=rs[:, None] * lp0.A, b=rs * lp0.b, c=lp0.c,
                   row_types=lp0.row_types, lower=lp0.lower, upper=lp0.upper)
    ref = solve_general(lp, options=F64)
    assert ref.status == SolveStatus.OPTIMAL
    res = solve_general(lp, presolve=True)  # default fp32 core
    assert res.status == SolveStatus.OPTIMAL
    assert res.z == pytest.approx(ref.z, rel=1e-5)


def test_empty_row_infeasible():
    lp = GeneralLP(A=np.zeros((1, 2)), b=np.array([-1.0]), c=np.ones(2),
                   row_types=["L"])
    pr = presolve(lp)
    assert pr.lp is None and pr.status == SolveStatus.INFEASIBLE
    res = solve_general(lp, options=F64, presolve=True)
    assert res.status == SolveStatus.INFEASIBLE


def test_empty_column_unbounded():
    lp = GeneralLP(A=np.array([[0.0, 1.0]]), b=np.array([1.0]),
                   c=np.array([1.0, -1.0]), row_types=["L"])
    pr = presolve(lp)
    assert pr.lp is None and pr.status == SolveStatus.UNBOUNDED


def test_singleton_equality_fixes_variable():
    # 2 x0 == 1 -> x0 = 0.5; remaining LP: max x1 s.t. x0 + x1 <= 1
    A = np.array([[2.0, 0.0], [1.0, 1.0]])
    lp = GeneralLP(A=A, b=np.array([1.0, 1.0]), c=np.array([0.3, 1.0]),
                   row_types=["E", "L"])
    res = solve_general(lp, options=F64, presolve=True)
    assert res.status == SolveStatus.OPTIMAL
    np.testing.assert_allclose(res.x, [0.5, 0.5], atol=1e-9)
    assert res.z == pytest.approx(0.65)
    # dual of the dropped E row: stationarity on x0 gives
    # c0 - 2*y0 - 1*y1 = rc0; x0 is basic-interior in the original LP,
    # y1 = 1 (binding L row carries x1's dual), so y0 = (0.3 - 1)/2
    kkt_check(lp, res.x, res.y)
    assert res.y[0] == pytest.approx((0.3 - 1.0) / 2.0, abs=1e-7)


def test_everything_eliminated_on_host():
    # two singleton E rows fix both variables; nothing reaches the device
    A = np.array([[1.0, 0.0], [0.0, 3.0]])
    lp = GeneralLP(A=A, b=np.array([0.25, 0.75]), c=np.array([2.0, 4.0]),
                   row_types=["E", "E"])
    res = solve_general(lp, options=F64, presolve=True)
    assert res.status == SolveStatus.OPTIMAL
    assert res.iters == 0
    np.testing.assert_allclose(res.x, [0.25, 0.25], atol=1e-12)
    assert res.z == pytest.approx(2 * 0.25 + 4 * 0.25)
    kkt_check(lp, res.x, res.y)


def test_crossed_singleton_bounds_infeasible():
    # x0 <= 0.2 and x0 >= 0.8 via two singleton rows
    A = np.array([[1.0, 0.0], [1.0, 0.0], [1.0, 1.0]])
    lp = GeneralLP(A=A, b=np.array([0.2, 0.8, 1.0]), c=np.ones(2),
                   row_types=["L", "G", "L"])
    res = solve_general(lp, options=F64, presolve=True)
    assert res.status == SolveStatus.INFEASIBLE


def test_warm_plus_presolve_rejected():
    lp = planted_lp(0)
    base = solve_general(lp, options=F64)
    with pytest.raises(ValueError, match="warm"):
        solve_general(lp, options=F64, presolve=True, warm=base.warm)


def test_stacked_singletons_binding_dual_only():
    """Two L singleton rows on the same column: only the tighter (binding)
    one may carry a dual; the slack one must get exactly 0."""
    A = np.array([[1.0, 0.0], [1.0, 0.0], [1.0, 1.0]])
    lp = GeneralLP(A=A, b=np.array([0.4, 0.9, 2.0]), c=np.array([1.0, -1.0]),
                   row_types=["L", "L", "L"])
    res = solve_general(lp, options=F64, presolve=True)
    assert res.status == SolveStatus.OPTIMAL
    np.testing.assert_allclose(res.x, [0.4, 0.0], atol=1e-9)
    kkt_check(lp, res.x, res.y)
    assert res.y[0] == pytest.approx(1.0, abs=1e-7)  # binding bound row
    assert res.y[1] == 0.0                           # slack bound row
