"""Exact steepest-edge pricing (the reference ladder's unchecked rung,
/root/reference/README.md:21).

The crux is pinned directly: the maintained weights must EQUAL
1 + ||B_inv A_j||^2 (recomputed from scratch in f64) after every pivot —
that is what separates exact steepest edge from the devex approximation.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from simplex_tpu import SimplexOptions, SolveStatus, solve
from simplex_tpu.oracle.generator import random_dense_lp
from simplex_tpu.oracle.reference import relative_gap, solve_scipy

SE64 = SimplexOptions(pricing="steepest", dtype=jnp.float64)


@pytest.mark.parametrize("m,n,seed", [(8, 20, 0), (32, 80, 1), (96, 240, 2)])
def test_steepest_matches_oracle(m, n, seed):
    A, b, c = random_dense_lp(m, n, seed=seed, dtype=np.float64)
    ref = solve_scipy(A, b, c)
    res = solve(A, b, c, options=SE64)
    assert res.status == SolveStatus.OPTIMAL
    assert relative_gap(res.z, ref.z) < 1e-9


def test_steepest_fp32_with_refactor():
    A, b, c = random_dense_lp(128, 320, seed=3)
    ref = solve_scipy(A, b, c)
    res = solve(
        A, b, c, options=SimplexOptions(pricing="steepest", refactor_every=64)
    )
    assert res.status == SolveStatus.OPTIMAL
    assert relative_gap(res.z, ref.z) < 1e-4


@pytest.mark.parametrize("defer_l", [0, 4])
def test_weights_are_exact_norms_every_pivot(defer_l):
    """gamma_j == 1 + ||B^{-1} A_j||^2 for every nonbasic j, after every
    pivot (f64; from-scratch recomputation as the reference value).

    defer_l=4 pins the round-5 composition with deferred rank-L updates:
    the u / binv_q pending-pair corrections must keep the recurrence exact
    BETWEEN flushes (pivots 1-3 run on a stale base + pending pairs)."""
    from simplex_tpu.core.state import Problem, initial_state_slack
    from simplex_tpu.core.step import pivot_step
    from simplex_tpu.kernels.dispatch import get_backend

    A, b, c = random_dense_lp(12, 30, seed=5, dtype=np.float64)
    opts = SimplexOptions(
        pricing="steepest", dtype=jnp.float64, update_defer=defer_l
    )
    prob = Problem(
        A=jnp.asarray(A), b=jnp.asarray(b), c=jnp.asarray(c)
    )
    state = initial_state_slack(
        prob, jnp.float64, pricing="steepest",
        update_defer=opts.resolve_defer(),
    )
    backend = get_backend("xla")
    A64 = np.asarray(A, np.float64)
    for _ in range(12):
        state = pivot_step(prob, state, opts, backend)
        if int(state.status) != int(SolveStatus.RUNNING):
            break
        basis = np.asarray(state.basis)
        T = np.linalg.solve(A64[:, basis], A64)  # B^{-1} A, exact
        gamma_ref = 1 + np.sum(T * T, axis=0)
        nonbasic = np.ones(A64.shape[1], bool)
        nonbasic[basis] = False
        np.testing.assert_allclose(
            np.asarray(state.gamma)[nonbasic],
            gamma_ref[nonbasic],
            rtol=1e-8,
            err_msg=f"after pivot {int(state.iters)}",
        )
    assert int(state.iters) >= 3  # the loop exercised real pivots


def test_steepest_no_more_pivots_than_dantzig_on_average():
    total_dantzig = total_se = 0
    for seed in range(6):
        A, b, c = random_dense_lp(48, 160, seed=40 + seed, dtype=np.float64)
        r_dan = solve(A, b, c, options=SimplexOptions(dtype=jnp.float64))
        r_se = solve(A, b, c, options=SE64)
        assert r_dan.status == r_se.status == SolveStatus.OPTIMAL
        assert relative_gap(r_se.z, r_dan.z) < 1e-9
        total_dantzig += r_dan.iters
        total_se += r_se.iters
    assert total_se <= total_dantzig * 1.05, (total_se, total_dantzig)


def test_steepest_unbounded():
    A = np.array([[-1.0, 1.0, 1.0]])
    b = np.array([1.0])
    c = np.array([1.0, 0.0, 0.0])
    res = solve(A, b, c, options=SimplexOptions(pricing="steepest"))
    assert res.status == SolveStatus.UNBOUNDED


def test_steepest_composes_with_update_defer():
    """Round 5: steepest + deferred rank-L updates is supported and lands on
    the same optimum as the eager path (identical pivot rule — the deferred
    representation is exact, so the walk itself should agree too)."""
    A, b, c = random_dense_lp(48, 120, seed=9, dtype=np.float64)
    ref = solve_scipy(A, b, c)
    eager = solve(A, b, c, options=SE64)
    deferred = solve(
        A, b, c,
        options=SimplexOptions(
            pricing="steepest", dtype=jnp.float64, update_defer=8
        ),
    )
    assert eager.status == deferred.status == SolveStatus.OPTIMAL
    assert relative_gap(deferred.z, ref.z) < 1e-9
    assert deferred.iters == eager.iters  # same exact rule, same walk


def test_steepest_defer_fp32_matches_oracle():
    A, b, c = random_dense_lp(128, 320, seed=11)
    ref = solve_scipy(A, b, c)
    res = solve(
        A, b, c,
        options=SimplexOptions(
            pricing="steepest", update_defer=16, refactor_every=64
        ),
    )
    assert res.status == SolveStatus.OPTIMAL
    assert relative_gap(res.z, ref.z) < 1e-4


def test_steepest_rejects_unsupported_combos():
    A, b, c = random_dense_lp(4, 10, seed=1)
    with pytest.raises(NotImplementedError, match="multi_price"):
        solve(
            A, b, c,
            options=SimplexOptions(pricing="steepest", multi_price=4),
        )
    # native bounds compose since round 3 (tests/test_bounded_pricing.py)
    res = solve(
        A, b, c, u=np.full(10, 2.0),
        options=SimplexOptions(pricing="steepest"),
    )
    assert res.status == SolveStatus.OPTIMAL


def test_steepest_rejected_by_sharded_modes():
    import jax

    from simplex_tpu.dist.mesh import make_mesh
    from simplex_tpu.dist.sharded import solve_sharded

    A, b, c = random_dense_lp(4, 8, seed=2)
    mesh = make_mesh()
    with pytest.raises(NotImplementedError, match="single-chip"):
        solve_sharded(
            A, b, c, mesh, options=SimplexOptions(pricing="steepest")
        )
