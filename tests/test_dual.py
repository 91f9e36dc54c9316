"""Dual simplex warm-start tests (round-2 verdict next-step #7).

Contract: after an optimal solve, the basis stays DUAL-feasible under any
RHS change, so ``solve_dual`` / ``reoptimize`` re-solves from it with a
dual pivot loop — measured here to take far fewer pivots than a cold solve
— and the result meets the same oracle-parity bar as a cold solve. A
perturbation that makes the problem empty must come back INFEASIBLE (the
dual goes unbounded), not wrong-OPTIMAL.
"""

import numpy as np
import pytest

from simplex_tpu import SimplexOptions, SolveStatus, solve
from simplex_tpu.analysis import ranging, reoptimize
from simplex_tpu.core.dual import solve_dual
from simplex_tpu.oracle.generator import random_dense_lp
from simplex_tpu.oracle.reference import relative_gap, solve_scipy

OPTS = SimplexOptions(refactor_every=64)


def _perturbed(b, seed, scale):
    rng = np.random.default_rng(seed)
    return (np.asarray(b, np.float64) * (1 + scale * rng.uniform(-1, 1, b.shape))).astype(b.dtype)


@pytest.mark.parametrize("m,n", [(16, 40), (48, 120)])
def test_warm_rhs_resolve_matches_oracle(m, n):
    A, b, c = random_dense_lp(m, n, seed=11)
    cold = solve(A, b, c, options=OPTS)
    assert cold.status == SolveStatus.OPTIMAL
    b2 = _perturbed(b, seed=5, scale=0.25)
    ref = solve_scipy(A, b2, c)
    assert ref.status == SolveStatus.OPTIMAL
    warm = reoptimize(A, b2, c, cold, options=OPTS)
    assert warm.status == SolveStatus.OPTIMAL
    assert relative_gap(warm.z, ref.z) < 1e-5
    assert warm.feas_err < 1e-4
    # duals of the re-solve must price b2 (strong duality)
    assert abs(float(warm.y @ np.asarray(b2, np.float64)) - warm.z) < 1e-3 * (
        1 + abs(warm.z)
    )


def test_warm_is_much_cheaper_than_cold():
    A, b, c = random_dense_lp(64, 160, seed=3)
    cold = solve(A, b, c, options=OPTS)
    assert cold.status == SolveStatus.OPTIMAL
    b2 = _perturbed(b, seed=9, scale=0.05)
    cold2 = solve(A, b2, c, options=OPTS)
    warm = reoptimize(A, b2, c, cold, options=OPTS)
    assert warm.status == SolveStatus.OPTIMAL
    assert relative_gap(warm.z, cold2.z) < 1e-5
    # the whole point: a small RHS move re-solves in a fraction of the
    # cold pivot count (dual pivots + the primal loop's certification pass)
    assert warm.iters <= max(4, cold2.iters // 4), (warm.iters, cold2.iters)


def test_rhs_inside_ranging_band_needs_no_pivots():
    A, b, c = random_dense_lp(24, 64, seed=7)
    cold = solve(A, b, c, options=OPTS)
    rng = ranging(A, b, c, cold.basis)
    # move each b_i by 40% of its allowable slack (basis provably unchanged)
    db = 0.4 * np.where(
        np.isfinite(rng.b_hi), rng.b_hi, 0.0
    ) + 0.4 * np.where(np.isfinite(rng.b_lo) & ~np.isfinite(rng.b_hi), rng.b_lo, 0.0)
    b2 = (np.asarray(b, np.float64) + db).astype(np.float32)
    ref = solve_scipy(A, b2, c)
    warm = reoptimize(A, b2, c, cold, options=OPTS)
    assert warm.status == SolveStatus.OPTIMAL
    assert warm.iters == 0, warm.iters  # same basis: values re-derived only
    assert relative_gap(warm.z, ref.z) < 1e-5
    np.testing.assert_array_equal(np.sort(warm.basis), np.sort(cold.basis))


def test_infeasible_rhs_change_detected():
    # max -x1 - 2 x2 s.t. x1 + x2 + s = b, all >= 0; b = 5 solves fine,
    # b = -1 is empty (a sum of nonnegatives cannot be negative)
    A = np.array([[1.0, 1.0, 1.0]], np.float32)
    b = np.array([5.0], np.float32)
    c = np.array([-1.0, -2.0, 0.0], np.float32)
    cold = solve(A, b, c, options=OPTS)
    assert cold.status == SolveStatus.OPTIMAL
    warm = reoptimize(A, np.array([-1.0], np.float32), c, cold, options=OPTS)
    assert warm.status == SolveStatus.INFEASIBLE


def test_dual_from_scratch_slack_basis():
    # all costs <= 0 => the slack basis is dual-feasible even with negative
    # b: the classic from-scratch dual simplex case (basis0=None)
    rng = np.random.default_rng(2)
    m, n = 12, 30
    A = rng.uniform(-1, 1, (m, n - m)).astype(np.float32)
    A = np.hstack([A, np.eye(m, dtype=np.float32)])
    b = rng.uniform(-2, 2, m).astype(np.float32)
    c = np.concatenate(
        [-rng.uniform(0.5, 2, n - m), np.zeros(m)]
    ).astype(np.float32)
    ref = solve_scipy(A, b, c)
    res = solve_dual(A, b, c, options=OPTS)
    assert res.status == ref.status
    if ref.status == SolveStatus.OPTIMAL:
        assert relative_gap(res.z, ref.z) < 1e-5


def test_bounded_warm_resolve():
    # native bounds: perturb b, warm-start with the prior at_upper flags
    from scipy.optimize import linprog

    rng = np.random.default_rng(4)
    m, k = 8, 20
    A0 = rng.uniform(0.2, 1.5, (m, k)).astype(np.float32)
    A = np.hstack([A0, np.eye(m, dtype=np.float32)])
    b = (A0 @ rng.uniform(0.2, 0.8, k) + rng.uniform(0.1, 1.0, m)).astype(
        np.float32
    )
    c = np.concatenate([rng.uniform(0.5, 2, k), np.zeros(m)]).astype(np.float32)
    u = np.concatenate(
        [rng.uniform(0.5, 1.5, k), np.full(m, np.inf)]
    ).astype(np.float32)

    def oracle(bv):
        r = linprog(
            -np.asarray(c, np.float64),
            A_eq=np.asarray(A, np.float64),
            b_eq=np.asarray(bv, np.float64),
            bounds=[(0, float(ui) if np.isfinite(ui) else None) for ui in u],
            method="highs",
        )
        return -r.fun if r.status == 0 else None

    cold = solve(A, b, c, u=u, options=OPTS)
    assert cold.status == SolveStatus.OPTIMAL
    b2 = _perturbed(b, seed=13, scale=0.15)
    z_ref = oracle(b2)
    assert z_ref is not None
    warm = solve_dual(
        A, b2, c, basis0=cold.basis, u=u, at_upper0=cold.at_upper,
        options=OPTS,
    )
    assert warm.status == SolveStatus.OPTIMAL
    assert relative_gap(warm.z, z_ref) < 1e-4
    assert warm.feas_err < 1e-4


def test_entry_contract_rejects_dual_infeasible_basis():
    # the slack basis of a problem with a positive cost is NOT dual-feasible;
    # solve_dual must say so (and point at the primal warm start) rather
    # than claim INFEASIBLE from an unsound dual loop
    A = np.array([[1.0, 1.0]], np.float32)  # slack basis = column 1
    b = np.array([-1.0], np.float32)
    c = np.array([1.0, 0.0], np.float32)
    with pytest.raises(ValueError, match="dual-feasible"):
        solve_dual(A, b, c, options=OPTS)


def test_cost_change_primal_warm_start_pairing():
    # the documented pairing: cost changes keep the old basis PRIMAL-
    # feasible, so solve(basis0=prev.basis) warm-starts those
    A, b, c = random_dense_lp(16, 40, seed=21)
    cold = solve(A, b, c, options=OPTS)
    rng = np.random.default_rng(6)
    c2 = (np.asarray(c, np.float64) * (1 + 0.2 * rng.uniform(-1, 1, c.shape))).astype(
        np.float32
    )
    ref = solve_scipy(A, b, c2)
    warm = solve(A, b, c2, basis0=cold.basis, options=OPTS)
    assert warm.status == SolveStatus.OPTIMAL
    assert relative_gap(warm.z, ref.z) < 1e-5


def _bounded_instance(m, k, seed, tight=0.6):
    """Sparse-ish bounded canonical LP where most columns have FINITE,
    fairly tight upper bounds (the BFRT's designed workload)."""
    rng = np.random.default_rng(seed)
    A0 = rng.uniform(0.2, 1.5, (m, k))
    A = np.hstack([A0, np.eye(m)]).astype(np.float32)
    b = (A0 @ rng.uniform(0.2, 0.8, k) + rng.uniform(0.1, 1.0, m)).astype(
        np.float32
    )
    c = np.concatenate([rng.uniform(0.5, 2, k), np.zeros(m)]).astype(
        np.float32
    )
    u = np.concatenate(
        [rng.uniform(0.2, tight, k), np.full(m, np.inf)]
    ).astype(np.float32)
    return A, b, c, u


def _oracle_bounded(A, b, c, u):
    from scipy.optimize import linprog

    r = linprog(
        -np.asarray(c, np.float64),
        A_eq=np.asarray(A, np.float64),
        b_eq=np.asarray(b, np.float64),
        bounds=[(0, float(ui) if np.isfinite(ui) else None) for ui in u],
        method="highs",
    )
    return (-r.fun, r.status) if r.status == 0 else (None, r.status)


def test_bound_flip_ratio_test_matches_oracle_and_saves_pivots():
    """The long-step (BFRT) dual: same optimum, and on bound-heavy
    instances no more total pivots than the single-break rule (each long
    step absorbs what the classic rule spends whole pivots on)."""
    total_flip = total_classic = 0
    for seed in (3, 4, 5):
        A, b, c, u = _bounded_instance(10, 28, seed)
        cold = solve(A, b, c, u=u, options=OPTS)
        assert cold.status == SolveStatus.OPTIMAL
        rng = np.random.default_rng(seed + 50)
        b2 = (
            np.asarray(b, np.float64)
            * (1 + 0.5 * rng.uniform(-1, 1, b.shape))
        ).astype(np.float32)
        z_ref, st = _oracle_bounded(A, b2, c, u)
        if st != 0:
            continue
        w_flip = solve_dual(
            A, b2, c, basis0=cold.basis, u=u, at_upper0=cold.at_upper,
            options=OPTS,
        )
        w_classic = solve_dual(
            A, b2, c, basis0=cold.basis, u=u, at_upper0=cold.at_upper,
            options=SimplexOptions(refactor_every=64, dual_flip=False),
        )
        assert w_flip.status == w_classic.status == SolveStatus.OPTIMAL
        assert relative_gap(w_flip.z, z_ref) < 1e-4, seed
        assert relative_gap(w_classic.z, z_ref) < 1e-4, seed
        total_flip += w_flip.iters
        total_classic += w_classic.iters
    assert total_flip <= total_classic, (total_flip, total_classic)


def test_bound_flip_infeasible_with_flips():
    """BFRT infeasibility: all eligible columns are bounded and flipping
    every one still leaves infeasibility -> INFEASIBLE (the dual ray
    includes the flips)."""
    # x1 + x2 + s = b with x1,x2 <= 1, s >= 0: b = -0.5 is infeasible even
    # after flips (sum of bounded nonnegatives can't go negative)
    A = np.array([[1.0, 1.0, 1.0]], np.float32)
    b = np.array([2.5], np.float32)
    c = np.array([-1.0, -2.0, 0.0], np.float32)
    u = np.array([1.0, 1.0, np.inf], np.float32)
    cold = solve(A, b, c, u=u, options=OPTS)
    assert cold.status == SolveStatus.OPTIMAL
    warm = solve_dual(
        A, np.array([-0.5], np.float32), c, basis0=cold.basis, u=u,
        at_upper0=cold.at_upper, options=OPTS,
    )
    assert warm.status == SolveStatus.INFEASIBLE


def test_reoptimize_batched_serving():
    """The serving pattern: many what-if RHS scenarios re-solved from ONE
    prior basis inside one vmapped executable; each must match its own
    oracle, and an infeasible scenario must not poison the batch."""
    from simplex_tpu.batch.vmapped import reoptimize_batched

    A, b, c = random_dense_lp(12, 30, seed=31)
    cold = solve(A, b, c, options=OPTS)
    rng = np.random.default_rng(9)
    B = 8
    bs2 = np.stack(
        [
            np.asarray(b, np.float64)
            * (1 + 0.2 * rng.uniform(-1, 1, b.shape))
            for _ in range(B)
        ]
    ).astype(np.float32)
    res = reoptimize_batched(A, bs2, c, cold, options=OPTS)
    for i in range(B):
        ref = solve_scipy(A, bs2[i], c)
        assert SolveStatus(int(res.status[i])) == ref.status, i
        if ref.status == SolveStatus.OPTIMAL:
            assert relative_gap(float(res.z[i]), ref.z) < 1e-4, i


def test_reoptimize_batched_mixed_statuses():
    # scenario 1 feasible, scenario 2 infeasible (negative RHS on an
    # all-positive row): statuses must be per-scenario
    A = np.array([[1.0, 1.0, 1.0]], np.float32)
    b = np.array([5.0], np.float32)
    c = np.array([-1.0, -2.0, 0.0], np.float32)
    cold = solve(A, b, c, options=OPTS)
    from simplex_tpu.batch.vmapped import reoptimize_batched

    bs2 = np.array([[3.0], [-1.0]], np.float32)
    res = reoptimize_batched(A, bs2, c, cold, options=OPTS)
    assert SolveStatus(int(res.status[0])) == SolveStatus.OPTIMAL
    assert SolveStatus(int(res.status[1])) == SolveStatus.INFEASIBLE
    assert abs(float(res.z[0]) - 0.0) < 1e-5  # origin optimal for c <= 0


def test_solve_general_warm_restart():
    """General-form (MPS-class) warm restarts: the warm token skips
    phase 1 entirely and the dual loop re-solves the standardized system
    from the stored basis; matches HiGHS on the perturbed instance."""
    from simplex_tpu.core.twophase import solve_general
    from simplex_tpu.oracle.generator import multiperiod_production_lp
    from simplex_tpu.oracle.reference import solve_scipy_general

    lp = multiperiod_production_lp(4, 3, seed=5)  # E rows + L rows + bounds
    cold = solve_general(lp, options=OPTS)
    assert cold.status == SolveStatus.OPTIMAL
    assert cold.warm is not None
    rng = np.random.default_rng(41)
    b2 = lp.b * (1 + 0.1 * rng.uniform(-1, 1, lp.b.shape))
    lp2 = lp._replace(b=b2)
    ref = solve_scipy_general(lp2)
    assert ref.status == SolveStatus.OPTIMAL
    cold2 = solve_general(lp2, options=OPTS)
    warm2 = solve_general(lp2, options=OPTS, warm=cold.warm)
    assert warm2.status == SolveStatus.OPTIMAL
    assert relative_gap(warm2.z, ref.z) < 1e-4
    assert warm2.phase1_iters == 0
    # the whole point: no phase-1 work and fewer total pivots
    assert warm2.iters < cold2.iters, (warm2.iters, cold2.iters)


def test_solve_general_warm_restart_sign_flip():
    """A b that crosses zero changes which rows the COLD standardization
    would flip; the warm token pins the original flips so the stored basis
    stays valid."""
    from simplex_tpu.core.twophase import GeneralLP, solve_general
    from simplex_tpu.oracle.reference import solve_scipy_general

    A = np.array([[1.0, 1.0], [1.0, -2.0]])
    b = np.array([4.0, 1.0])
    c = np.array([-1.0, -2.0])
    lp = GeneralLP(A=A, b=b, c=c, row_types=["L", "L"])
    cold = solve_general(lp, options=OPTS)
    assert cold.status == SolveStatus.OPTIMAL
    lp2 = lp._replace(b=np.array([4.0, -1.0]))  # row 2's sign flips
    ref = solve_scipy_general(lp2)
    warm = solve_general(lp2, options=OPTS, warm=cold.warm)
    assert warm.status == ref.status == SolveStatus.OPTIMAL
    assert relative_gap(warm.z, ref.z) < 1e-5


def test_solve_general_warm_infeasible():
    from simplex_tpu.core.twophase import GeneralLP, solve_general

    A = np.array([[1.0, 1.0]])
    lp = GeneralLP(
        A=A, b=np.array([2.0]), c=np.array([-1.0, -1.0]),
        row_types=["E"], upper=np.array([1.5, 1.5]),
        lower=np.zeros(2),
    )
    cold = solve_general(lp, options=OPTS)
    assert cold.status == SolveStatus.OPTIMAL
    warm = solve_general(
        lp._replace(b=np.array([4.0])), options=OPTS, warm=cold.warm
    )  # x1+x2 = 4 impossible with u = 1.5 each
    assert warm.status == SolveStatus.INFEASIBLE
