"""Bounded-variable LPs end-to-end: _preprocess_bounds + two-phase + MPS.

Round-1 verdict item #1: MPS BOUNDS were parsed but silently dropped, so an
infeasible bounded instance (G row + UP 0.25) returned OPTIMAL. These tests
pin the fix: every route honors lower/upper, with scipy/HiGHS as the oracle
(the role GLPK plays for the reference, ``solver_glpk.cpp:23-36``).
"""

import numpy as np
import pytest

from simplex_tpu.core.twophase import GeneralLP, solve_general
from simplex_tpu.oracle.reference import relative_gap, solve_scipy_general
from simplex_tpu.status import SolveStatus

GAP = 1e-6


def check_against_highs(lp: GeneralLP, places=GAP, options=None):
    kw = {} if options is None else {"options": options}
    ours = solve_general(lp, **kw)
    ref = solve_scipy_general(lp)
    assert ours.status == ref.status, (ours.status, ref.status)
    if ref.status == SolveStatus.OPTIMAL:
        assert relative_gap(ours.z, ref.z) < places, (ours.z, ref.z)
        # the returned point must actually satisfy the bounds
        lower = np.zeros(lp.A.shape[1]) if lp.lower is None else lp.lower
        upper = (
            np.full(lp.A.shape[1], np.inf) if lp.upper is None else lp.upper
        )
        assert np.all(ours.x >= lower - 1e-5)
        assert np.all(ours.x <= upper + 1e-5)
    return ours


def test_verdict_repro_infeasible_upper_bounds():
    """The round-1 wrong-OPTIMAL: x0+x1 >= 1 with x <= 0.25 is INFEASIBLE."""
    lp = GeneralLP(
        A=np.array([[1.0, 1.0]]),
        b=np.array([1.0]),
        c=np.array([1.0, 0.0]),
        row_types=["G"],
        lower=np.zeros(2),
        upper=np.array([0.25, 0.25]),
    )
    res = solve_general(lp)
    assert res.status == SolveStatus.INFEASIBLE
    assert solve_scipy_general(lp).status == SolveStatus.INFEASIBLE


def test_upper_bounds_bind():
    # max x0 + x1 s.t. x0 + x1 <= 10, x0 <= 2, x1 <= 3 -> z = 5
    lp = GeneralLP(
        A=np.array([[1.0, 1.0]]),
        b=np.array([10.0]),
        c=np.array([1.0, 1.0]),
        row_types=["L"],
        lower=np.zeros(2),
        upper=np.array([2.0, 3.0]),
    )
    res = check_against_highs(lp)
    assert abs(res.z - 5.0) < 1e-6


def test_shifted_lower_bounds():
    # max -x0 - x1 s.t. x0 + x1 >= 7, x >= [2, 1] -> z = -7
    lp = GeneralLP(
        A=np.array([[1.0, 1.0]]),
        b=np.array([7.0]),
        c=np.array([-1.0, -1.0]),
        row_types=["G"],
        lower=np.array([2.0, 1.0]),
        upper=np.full(2, np.inf),
    )
    res = check_against_highs(lp)
    assert abs(res.z + 7.0) < 1e-6


def test_negative_lower_bound():
    # max x0 s.t. x0 + x1 == 0, x0 <= 4, x1 >= -3 (so x0 <= 3) -> z = 3
    lp = GeneralLP(
        A=np.array([[1.0, 1.0]]),
        b=np.array([0.0]),
        c=np.array([1.0, 0.0]),
        row_types=["E"],
        lower=np.array([0.0, -3.0]),
        upper=np.array([4.0, np.inf]),
    )
    res = check_against_highs(lp)
    assert abs(res.z - 3.0) < 1e-6
    assert abs(res.x[1] + 3.0) < 1e-5


def test_free_variable_split():
    # max -|x| style: free x with equality pinning it negative
    lp = GeneralLP(
        A=np.array([[1.0, 1.0], [1.0, 0.0]]),
        b=np.array([2.0, -1.5]),
        c=np.array([0.0, 1.0]),
        row_types=["E", "E"],
        lower=np.array([-np.inf, 0.0]),
        upper=np.array([np.inf, np.inf]),
    )
    res = check_against_highs(lp)
    assert abs(res.x[0] + 1.5) < 1e-5
    assert abs(res.z - 3.5) < 1e-6


def test_fixed_variable_substitution():
    # x1 fixed at 2 via lo == up
    lp = GeneralLP(
        A=np.array([[1.0, 1.0]]),
        b=np.array([5.0]),
        c=np.array([1.0, 5.0]),
        row_types=["L"],
        lower=np.array([0.0, 2.0]),
        upper=np.array([np.inf, 2.0]),
    )
    res = check_against_highs(lp)
    assert abs(res.x[1] - 2.0) < 1e-6
    assert abs(res.z - 13.0) < 1e-6  # x0 = 3, z = 3 + 10


def test_reflect_free_below_bounded_above():
    # -inf < x0 <= 5, maximize x0 subject to x0 + x1 <= 8
    lp = GeneralLP(
        A=np.array([[1.0, 1.0]]),
        b=np.array([8.0]),
        c=np.array([1.0, 0.0]),
        row_types=["L"],
        lower=np.array([-np.inf, 0.0]),
        upper=np.array([5.0, np.inf]),
    )
    res = check_against_highs(lp)
    assert abs(res.z - 5.0) < 1e-6


def test_crossed_bounds_infeasible():
    lp = GeneralLP(
        A=np.eye(1),
        b=np.array([1.0]),
        c=np.array([1.0]),
        row_types=["L"],
        lower=np.array([2.0]),
        upper=np.array([1.0]),
    )
    assert solve_general(lp).status == SolveStatus.INFEASIBLE


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_random_bounded_lps_match_highs(seed):
    """Random mixed-row LPs with random finite/infinite bounds vs HiGHS."""
    rng = np.random.default_rng(seed)
    m, k = 12, 20
    A = rng.normal(size=(m, k))
    b = rng.normal(size=m) * 2
    c = rng.normal(size=k)
    row_types = rng.choice(["L", "G", "E"], size=m, p=[0.5, 0.3, 0.2]).tolist()
    # bounds: mix of default, shifted, finite-upper, free
    lower = np.where(rng.random(k) < 0.5, 0.0, rng.normal(size=k) - 1)
    lower = np.where(rng.random(k) < 0.15, -np.inf, lower)
    # finite uppers sit above the lower when it is finite, anywhere otherwise
    fin_up = np.where(
        np.isfinite(lower),
        lower + np.abs(rng.normal(size=k)) * 3 + 0.1,
        rng.normal(size=k) * 3,
    )
    upper = np.where(rng.random(k) < 0.6, fin_up, np.inf)
    lp = GeneralLP(A=A, b=b, c=c, row_types=row_types, lower=lower, upper=upper)
    # f64 like the oracle: ill-scaled random instances near the
    # bounded/unbounded edge need exact status classification (fp32's 1e-4
    # pricing eps can mask a barely-improving ray; seed 2 does exactly that)
    import jax.numpy as jnp

    from simplex_tpu.config import SimplexOptions

    check_against_highs(lp, options=SimplexOptions(dtype=jnp.float64))


def test_bounded_mps_roundtrip(tmp_path):
    """The verdict's repro as an actual MPS file through the CLI loader."""
    mps = """NAME          REPRO
ROWS
 N  COST
 G  R1
COLUMNS
    X0        COST      1.0   R1        1.0
    X1        R1        1.0
RHS
    RHS       R1        1.0
BOUNDS
 UP BND       X0        0.25
 UP BND       X1        0.25
ENDATA
"""
    p = tmp_path / "repro.mps"
    p.write_text(mps)
    from simplex_tpu.cli import _load

    loaded, c0, maximize = _load(str(p), True)
    assert isinstance(loaded, GeneralLP)
    assert not maximize  # MPS default is minimize
    res = solve_general(loaded)
    assert res.status == SolveStatus.INFEASIBLE


def test_ranges_mps(tmp_path):
    """RANGES expands to a two-sided row (verdict item #6)."""
    # minimize x0 + x1 s.t. 2 <= x0 + x1 <= 5 (L row b=5 range 3) -> z = 2
    mps = """NAME          RNG
ROWS
 N  COST
 L  R1
COLUMNS
    X0        COST      1.0   R1        1.0
    X1        COST      1.0   R1        1.0
RHS
    RHS       R1        5.0
RANGES
    RNG       R1        3.0
ENDATA
"""
    p = tmp_path / "rng.mps"
    p.write_text(mps)
    from simplex_tpu.io.mps import read_mps

    prob = read_mps(p)
    assert len(prob.row_types) == 2  # expanded into L + G
    lp = GeneralLP(
        A=prob.A, b=prob.b, c=-prob.c, row_types=prob.row_types,
        lower=prob.lower, upper=prob.upper,
    )
    res = check_against_highs(lp)
    assert abs(-res.z - 2.0) < 1e-6


def test_ranges_equality_row(tmp_path):
    # E row b=1 range 2 -> 1 <= x0 <= 3; maximize x0 -> 3
    mps = """NAME          RNGE
OBJSENSE
    MAX
ROWS
 N  COST
 E  R1
COLUMNS
    X0        COST      1.0   R1        1.0
RHS
    RHS       R1        1.0
RANGES
    RNG       R1        2.0
ENDATA
"""
    p = tmp_path / "rnge.mps"
    p.write_text(mps)
    from simplex_tpu.io.mps import read_mps

    prob = read_mps(p)
    assert prob.maximize
    lp = GeneralLP(
        A=prob.A, b=prob.b, c=prob.c, row_types=prob.row_types,
        lower=prob.lower, upper=prob.upper,
    )
    res = check_against_highs(lp)
    assert abs(res.z - 3.0) < 1e-6


def test_objective_constant(tmp_path):
    """RHS entry on the N row is an objective constant (GLPK semantics)."""
    mps = """NAME          OBJC
ROWS
 N  COST
 L  R1
COLUMNS
    X0        COST      1.0   R1        1.0
RHS
    RHS       R1        4.0   COST      -10.0
ENDATA
"""
    p = tmp_path / "objc.mps"
    p.write_text(mps)
    from simplex_tpu.io.mps import read_mps

    prob = read_mps(p)
    assert prob.c0 == 10.0  # obj = c.x + 10


def test_general_duals_match_highs():
    """GeneralSolveResult.y: row duals (sign-corrected for the b>=0
    normalization) match HiGHS marginals on a mixed-row instance."""
    from scipy.optimize import linprog

    lp = GeneralLP(
        A=np.array([[1.0, 2.0], [3.0, 1.0], [1.0, -1.0]]),
        b=np.array([8.0, 9.0, -1.0]),  # third row negative: gets flipped
        c=np.array([3.0, 2.0]),
        row_types=["L", "L", "G"],
    )
    res = solve_general(lp)
    ref = solve_scipy_general(lp)
    assert res.status == ref.status == SolveStatus.OPTIMAL
    assert res.y is not None and res.y.shape == (3,)
    # Dual optima need not be unique (this instance is dual-degenerate:
    # HiGHS returns a different vertex with the same y.b), so check the
    # DUALITY CONDITIONS rather than a specific vertex:
    # strong duality: y.b == z
    assert abs(float(res.y @ lp.b) - res.z) < 1e-5
    # dual feasibility for maximize: L rows y>=0, G rows y<=0
    assert res.y[0] >= -1e-9 and res.y[1] >= -1e-9
    assert res.y[2] <= 1e-9
    # reduced costs: c_j - y.A_j <= 0 for all structural columns
    red = lp.c - res.y @ lp.A
    assert red.max() < 1e-5


def test_redundant_row_dual_not_bigM():
    """Regression (round-2 review #3): a redundant row's pinned artificial
    carried the phase-2 big-M cost straight into that row's dual. With the
    pinned artificial priced at 0, duals stay O(|c|)."""
    # duplicated constraint -> one redundant row
    lp = GeneralLP(
        A=np.array([[1.0, 1.0], [1.0, 1.0], [1.0, -1.0]]),
        b=np.array([4.0, 4.0, 0.0]),
        c=np.array([2.0, 1.0]),
        row_types=["E", "E", "L"],
    )
    res = solve_general(lp)
    ref = solve_scipy_general(lp)
    assert res.status == ref.status == SolveStatus.OPTIMAL
    assert relative_gap(res.z, ref.z) < 1e-6
    assert res.y is not None
    # duals bounded by the data scale, not the 1e4 big-M
    assert np.abs(res.y).max() < 100
    # strong duality on the original rows still holds
    assert abs(float(res.y @ lp.b) - res.z) < 1e-5
