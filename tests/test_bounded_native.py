"""Native bounded-variable simplex (round-3 headline feature).

The core solver now takes upper bounds directly (``solve(..., u=)``):
nonbasic columns may park at 0 or at u_j, the ratio test is two-sided, and
bound-flip steps change no basis at all — replacing the round-2 general
route's row-per-finite-upper expansion (``core/twophase.py``), which doubled
m on bound-heavy instances. The reference's GLPK oracle handled bounds
natively inside the library (``solver_glpk.cpp:23``,
``glpk_interface.cpp:46-52``); its CUDA solvers never did.

Oracle: scipy/HiGHS on the same canonical-form instance.
"""

import dataclasses

import numpy as np
import pytest
import scipy.optimize as sopt

from simplex_tpu.config import SimplexOptions
from simplex_tpu.core.solver import solve
from simplex_tpu.status import SolveStatus

GAP = 1e-6


def _rel(a, b):
    return abs(a - b) / max(1.0, abs(a), abs(b))


def _random_bounded(rng, m, k, frac_bounded=0.7, frac_start_upper=0.0):
    """max c.x  s.t.  A0 x <= b (b > 0), 0 <= x <= u  as canonical form.

    Returns (A, b, c, u) where A = [A0 | I] with the slack block basic and
    feasible at x = 0 (every test starts from the canonical slack basis,
    matching the reference's input contract, src/v1_baseline.cu:336-339).
    """
    A0 = rng.uniform(0.1, 1.0, size=(m, k))
    b = rng.uniform(m * 0.5, m * 1.5, size=m)
    c0 = rng.uniform(0.1, 1.0, size=k)
    u0 = np.where(
        rng.uniform(size=k) < frac_bounded,
        rng.uniform(0.2, 3.0, size=k),
        np.inf,
    )
    A = np.concatenate([A0, np.eye(m)], axis=1)
    c = np.concatenate([c0, np.zeros(m)])
    u = np.concatenate([u0, np.full(m, np.inf)])
    return A, b, c, u


def _oracle(A, b, c, u, m):
    """HiGHS on the same equality-form instance (slacks included)."""
    bounds = [(0.0, uj if np.isfinite(uj) else None) for uj in u]
    res = sopt.linprog(-c, A_eq=A, b_eq=b, bounds=bounds, method="highs")
    return res


def check(A, b, c, u, options=None, at_upper0=None):
    kw = {"options": options} if options is not None else {}
    r = solve(A, b, c, u=u, at_upper0=at_upper0, **kw)
    ref = _oracle(A, b, c, u, A.shape[0])
    assert ref.status == 0, f"oracle failed: {ref.status}"
    assert r.status == SolveStatus.OPTIMAL, r.status
    assert _rel(r.z, -ref.fun) < GAP, (r.z, -ref.fun)
    # the returned point must satisfy Ax=b and the bounds
    assert np.max(np.abs(A @ r.x - b)) < 1e-5 * max(1.0, np.abs(b).max())
    assert np.all(r.x >= -1e-5)
    assert np.all(r.x <= u + 1e-5)
    assert r.feas_err < 1e-5
    return r


def test_tiny_all_flips():
    """Both structurals hit their uppers: the solve is two bound flips and
    zero basis changes (the expansion route would have added two rows)."""
    A = np.array([[1.0, 1.0, 1.0]])
    b = np.array([4.0])
    c = np.array([1.0, 2.0, 0.0])
    u = np.array([1.0, 3.0, np.inf])
    r = check(A, b, c, u)
    assert r.z == pytest.approx(7.0)
    assert list(r.at_upper) == [True, True, False]
    np.testing.assert_allclose(r.x, [1.0, 3.0, 0.0], atol=1e-6)


def test_basic_variable_leaves_at_upper():
    """Forces the theta_inc outcome: a BASIC variable is driven up to its
    own finite bound and leaves the basis at_upper."""
    # max 3 x0 s.t. x0 - x1 + s0 = 1, x0 + s1 = 5, x1 <= 2
    # raising x0 (entering) raises x1?? — construct directly: basic slack
    # with finite upper. max x0: x0 + s = 3, s <= 1 with s starting basic
    # at 3 > u_s... make b respect s0 <= u. Use: x0 + s = 3, u_s = 4
    # (s basic at 3, decreasing). Instead force INCREASING basic: row
    # -x0 + s = 1 -> s = 1 + x0 grows with x0; u_s = 2 caps x0 at 1.
    A = np.array([[-1.0, 1.0], [1.0, 1e-9]])  # second row bounds x0 <= 4
    # keep it clean: two rows, two slacks
    A = np.array([[-1.0, 1.0, 0.0], [1.0, 0.0, 1.0]])
    b = np.array([1.0, 4.0])
    c = np.array([1.0, 0.0, 0.0])
    u = np.array([np.inf, 2.0, np.inf])  # slack s0 <= 2 caps x0 at 1
    r = check(A, b, c, u)
    assert r.z == pytest.approx(1.0)
    assert r.at_upper[1]  # s0 left the basis at its upper bound


def test_start_at_upper_enters_from_upper():
    """Start a column AT its upper bound; optimal requires decreasing it
    (entering from upper, sigma = -1)."""
    # max -2 x0 + x1 s.t. x0 + x1 + s = 2, x0 <= 1.5, x1 <= 1
    A = np.array([[1.0, 1.0, 1.0]])
    b = np.array([2.0])
    c = np.array([-2.0, 1.0, 0.0])
    u = np.array([1.5, 1.0, np.inf])
    at0 = np.array([True, False, False])  # x0 parked at 1.5: z = -3 start
    r = check(A, b, c, u, at_upper0=at0)
    assert r.z == pytest.approx(1.0)  # x0 -> 0, x1 -> 1
    np.testing.assert_allclose(r.x, [0.0, 1.0, 1.0], atol=1e-6)


def test_unbounded_with_finite_bounds_elsewhere():
    """A column with u = inf and nothing blocking => UNBOUNDED, even though
    other columns have finite bounds."""
    A = np.array([[1.0, -1.0, 1.0]])
    b = np.array([1.0])
    c = np.array([0.0, 1.0, 0.0])
    u = np.array([2.0, np.inf, np.inf])
    # raising x1 raises the slack; nothing blocks
    r = solve(A, b, c, u=u)
    assert r.status == SolveStatus.UNBOUNDED


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
@pytest.mark.parametrize("ratio", ["harris", "classic"])
def test_random_vs_highs(seed, ratio):
    rng = np.random.default_rng(seed)
    m, k = 24, 40
    A, b, c, u = _random_bounded(rng, m, k)
    opts = SimplexOptions(dtype=np.float64, ratio=ratio)
    check(A, b, c, u, options=opts)


@pytest.mark.parametrize("seed", [10, 11])
def test_random_fp32(seed):
    rng = np.random.default_rng(seed)
    m, k = 32, 56
    A, b, c, u = _random_bounded(rng, m, k)
    check(A, b, c, u, options=SimplexOptions(dtype=np.float32))


def test_random_start_at_upper():
    """Warm-start style: park every finitely-bounded column at its upper
    (infeasible-in-spirit but basis-feasible start is not guaranteed, so
    only run when the slack basis stays feasible: b - A_N u_N >= 0)."""
    rng = np.random.default_rng(42)
    m, k = 16, 24
    A, b, c, u = _random_bounded(rng, m, k, frac_bounded=0.5)
    at0 = np.isfinite(u)
    x_N = np.where(at0, u, 0.0)
    if np.any(b - A @ x_N < 0):
        b = A @ x_N + rng.uniform(0.5, 1.0, size=m)  # make it feasible
    check(A, b, c, u, options=SimplexOptions(dtype=np.float64), at_upper0=at0)


@pytest.mark.parametrize(
    "cfg",
    [
        dict(pricing_dtype="bfloat16"),
        dict(update_defer=4),
        dict(partial_pricing=4, partial_min_segment=2),
        dict(
            partial_pricing=4,
            partial_min_segment=2,
            pricing_dtype="bfloat16",
            update_defer=4,
        ),
        dict(refactor_every=16),
        dict(bland_after=1),  # exercise Bland on the bounded rule
    ],
)
def test_flagship_configs_bounded(cfg):
    """Every pricing/update configuration solves the bounded instance to the
    same optimum (shadow re-verification, segment fallback, rank-L deferral,
    refactorization, and Bland all honor the two-sided rule)."""
    rng = np.random.default_rng(7)
    m, k = 16, 32  # n = 48 divisible by 4 segments
    A, b, c, u = _random_bounded(rng, m, k)
    check(A, b, c, u, options=SimplexOptions(dtype=np.float32, **cfg))


def test_devex_accepted_with_bounds():
    # round-3: the dantzig-only restriction is lifted (devex_choose_bounded;
    # see tests/test_bounded_pricing.py for the full parity/exactness suite)
    A = np.array([[1.0, 1.0]])
    b = np.array([1.0])
    c = np.array([1.0, 0.0])
    u = np.array([2.0, np.inf])
    res = solve(A, b, c, u=u, options=SimplexOptions(pricing="devex"))
    assert res.status == SolveStatus.OPTIMAL
    assert abs(res.z - 1.0) < 1e-6


def test_all_inf_u_is_classic_path():
    """u of all +inf falls back to the unbounded code path (at_upper None)."""
    A = np.array([[1.0, 1.0]])
    b = np.array([3.0])
    c = np.array([2.0, 0.0])
    r = solve(A, b, c, u=np.array([np.inf, np.inf]))
    assert r.status == SolveStatus.OPTIMAL and r.z == pytest.approx(6.0)
    assert r.at_upper is None


def test_pallas_backend_delegates_bounded_ops():
    """backend='pallas' solves bounded instances through the XLA bounded ops
    (interpret mode on CPU)."""
    rng = np.random.default_rng(3)
    A, b, c, u = _random_bounded(rng, 8, 12)
    check(A, b, c, u, options=SimplexOptions(dtype=np.float32, backend="pallas"))


def test_fixed_width_zero_upper():
    """u_j = 0 pins a column at 0; its flip toggles once and never cycles."""
    A = np.array([[1.0, 1.0, 1.0]])
    b = np.array([2.0])
    c = np.array([5.0, 1.0, 0.0])
    u = np.array([0.0, np.inf, np.inf])  # the attractive column is pinned
    r = check(A, b, c, u)
    assert r.z == pytest.approx(2.0)
    assert r.x[0] == pytest.approx(0.0, abs=1e-7)
