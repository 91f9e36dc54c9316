"""Numerical-stability machinery: Harris ratio test + Newton-Schulz
refactorization.

Pinned by real failures observed on v5e at 8192x16384 fp32:
  * the classic smallest-ratio rule admits arbitrarily tiny pivots whose
    1/alpha_q blows up the product-form inverse (reference README.md:29
    open TODO) — the solve diverged to SINGULAR/NaN; Harris converges to
    the exact optimum,
  * LU inversion (jnp.linalg.solve) takes 37 s at m=8192 on the MXU and
    faults the TPU worker inside nested control flow; Newton-Schulz
    refinement of the drifted inverse reaches the same residual in 200 ms.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from simplex_tpu import SimplexOptions, SolveStatus, solve
from simplex_tpu.kernels import xla as _xla
from simplex_tpu.oracle.generator import random_dense_lp
from simplex_tpu.oracle.reference import relative_gap, solve_scipy

NO = jnp.asarray(False)
YES = jnp.asarray(True)


def test_harris_picks_larger_pivot_among_ties():
    # rows 0 and 1 tie on the ratio (within feas_tol); row 1 has the larger
    # pivot and must win. Classic picks row 0 (lowest index).
    x_b = jnp.asarray([1e-8, 2.0, 3.0], jnp.float32)
    alpha = jnp.asarray([1e-6, 2.0, 0.5], jnp.float32)
    basis = jnp.arange(3, dtype=jnp.int32)
    q_c, _, unb_c = _xla.ratio_argmin(x_b, alpha, basis, 1e-7, NO)
    q_h, theta_h, unb_h = _xla.ratio_argmin_harris(x_b, alpha, basis, 1e-7, NO)
    assert not bool(unb_c) and not bool(unb_h)
    assert int(q_h) == 1  # largest alpha among rows within the relaxed bound
    assert float(theta_h) == pytest.approx(1.0, rel=1e-6)


def test_harris_unbounded_and_bland_match_classic():
    x_b = jnp.asarray([1.0, 2.0], jnp.float32)
    alpha = jnp.asarray([-1.0, -2.0], jnp.float32)
    basis = jnp.arange(2, dtype=jnp.int32)
    _, _, unb = _xla.ratio_argmin_harris(x_b, alpha, basis, 1e-7, NO)
    assert bool(unb)
    # under Bland, Harris must reproduce the classic smallest-basis-index
    # tie-break (the anti-cycling guarantee depends on it)
    x_b = jnp.asarray([2.0, 2.0, 9.0], jnp.float32)
    alpha = jnp.asarray([1.0, 1.0, 1.0], jnp.float32)
    basis = jnp.asarray([7, 3, 5], jnp.int32)
    q_h, _, _ = _xla.ratio_argmin_harris(x_b, alpha, basis, 1e-7, YES)
    q_c, _, _ = _xla.ratio_argmin(x_b, alpha, basis, 1e-7, YES)
    assert int(q_h) == int(q_c) == 1  # basis index 3 is smallest among ties


@pytest.mark.parametrize("ratio", ["classic", "harris"])
def test_ratio_rules_reach_same_objective(ratio):
    A, b, c = random_dense_lp(32, 80, seed=13, dtype=np.float32)
    ref = solve_scipy(A, b, c)
    res = solve(A, b, c, options=SimplexOptions(ratio=ratio))
    assert res.status == SolveStatus.OPTIMAL
    assert relative_gap(res.z, ref.z) < 1e-5


def test_newton_refactorize_matches_exact_inverse():
    from simplex_tpu.core.state import Problem, initial_state
    from simplex_tpu.core.step import refactorize
    from simplex_tpu.kernels.dispatch import get_backend

    rng = np.random.default_rng(0)
    m, n = 24, 60
    A, b, c = random_dense_lp(m, n, seed=1, dtype=np.float64)
    basis = np.sort(rng.choice(n, size=m, replace=False)).astype(np.int32)
    while abs(np.linalg.det(A[:, basis])) < 1e-6:
        basis = np.sort(rng.choice(n, size=m, replace=False)).astype(np.int32)
    prob = Problem(jnp.asarray(A), jnp.asarray(b), jnp.asarray(c))
    state = initial_state(prob, jnp.asarray(basis), jnp.float64)
    # perturb B_inv to emulate product-form drift, then refactorize
    drift = 1e-6 * rng.standard_normal((m, m))
    state = state._replace(B_inv=state.B_inv + jnp.asarray(drift))
    out = jax.jit(
        lambda p, s: refactorize(p, s, get_backend("xla"))
    )(prob, state)
    B_exact = np.linalg.inv(A[:, basis])
    np.testing.assert_allclose(np.asarray(out.B_inv), B_exact, rtol=1e-10, atol=1e-12)
    # x_b is the TRUE basic solution (no clamping — A_B x_b = b must hold)
    np.testing.assert_allclose(
        np.asarray(out.x_b), B_exact @ b, rtol=1e-9, atol=1e-11
    )


def test_newton_refactorize_stops_on_nonimproving_seed():
    # a garbage seed (zeros) cannot contract; refactorize must return without
    # hanging (residual non-improving -> loop exits) rather than diverge.
    from simplex_tpu.core.state import Problem, initial_state_slack
    from simplex_tpu.core.step import refactorize
    from simplex_tpu.kernels.dispatch import get_backend

    A, b, c = random_dense_lp(8, 20, seed=2, dtype=np.float64)
    prob = Problem(jnp.asarray(A), jnp.asarray(b), jnp.asarray(c))
    state = initial_state_slack(prob, jnp.float64)
    state = state._replace(B_inv=jnp.zeros_like(state.B_inv))
    out = jax.jit(
        lambda p, s: refactorize(p, s, get_backend("xla"))
    )(prob, state)
    assert np.all(np.isfinite(np.asarray(out.B_inv)))


def test_flagship_config_parity():
    # the full flagship TPU config at test scale: devex + bf16 pricing +
    # deferred updates + harris + periodic Newton refactorization
    A, b, c = random_dense_lp(64, 160, seed=21, dtype=np.float32)
    ref = solve_scipy(A, b, c)
    res = solve(
        A, b, c,
        options=SimplexOptions(
            pricing="devex",
            pricing_dtype="bfloat16",
            update_defer=16,
            refactor_every=64,
            ratio="harris",
        ),
    )
    assert res.status == SolveStatus.OPTIMAL
    assert relative_gap(res.z, ref.z) < 1e-5


def test_inverse_newton_from_scratch():
    from simplex_tpu.core.linalg import inverse_newton

    rng = np.random.default_rng(3)
    for m in (16, 96):
        B = np.asarray(rng.standard_normal((m, m)), np.float32)
        B += m * np.eye(m, dtype=np.float32) * 0.1  # keep well-conditioned
        X, resid = inverse_newton(jnp.asarray(B))
        assert float(resid) < 1e-4
        # Newton drives the RIGHT residual ||B X - I|| to the fp floor
        np.testing.assert_allclose(B @ np.asarray(X), np.eye(m), atol=1e-4)

    # singular input: reports a non-contracting residual instead of raising
    S = jnp.zeros((8, 8), jnp.float32)
    _, resid = inverse_newton(S)
    assert float(resid) >= 1.0


def test_mask_basic_blocks_reentry():
    c = jnp.zeros(6, jnp.float32)
    basis = jnp.asarray([1, 4], jnp.int32)
    c_eff = _xla.mask_basic(c, basis)
    y = jnp.zeros(2, jnp.float32)
    A = jnp.ones((2, 6), jnp.float32)
    p, min_e = _xla.choose_entering(y, A, c_eff, 1e-5, NO)
    assert int(p) not in (1, 4)
    # all columns basic -> masked min_e is hugely positive -> "optimal"
    c_all = _xla.mask_basic(jnp.zeros(2, jnp.float32), jnp.asarray([0, 1]))
    _, min_all = _xla.choose_entering(y, A[:, :2], c_all, 1e-5, NO)
    assert float(min_all) > 1e20


@pytest.mark.parametrize("pricing", ["dantzig", "devex"])
def test_basis_never_duplicates(pricing):
    # drifted duals must not re-admit a basic column (observed at 16k:
    # duplicate basis -> singular). Pin uniqueness on a long-ish solve.
    A, b, c = random_dense_lp(48, 120, seed=17, dtype=np.float32)
    res = solve(
        A, b, c,
        options=SimplexOptions(
            pricing=pricing, pricing_dtype="bfloat16", update_defer=8,
            refactor_every=32,
        ),
    )
    assert res.status == SolveStatus.OPTIMAL
    assert len(np.unique(res.basis)) == len(res.basis)
