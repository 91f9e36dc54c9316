"""Pivot-step invariants: the incremental O(m)/O(m^2) updates must equal the
from-scratch recomputation the reference's v1 does every iteration
(`src/v1_baseline.cu:356-357,421-422`), i.e. after every pivot:

    B_inv ~= inv(A[:, basis]),  y ~= c_b @ B_inv,  x_b ~= B_inv @ b.

This is the automated form of the reference's 'version ladder as regression'
practice (SURVEY.md §4 point 4).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from simplex_tpu.config import SimplexOptions
from simplex_tpu.core.state import Problem, initial_state_slack
from simplex_tpu.core.step import pivot_step, refactorize
from simplex_tpu.kernels.dispatch import get_backend
from simplex_tpu.oracle.generator import random_dense_lp
from simplex_tpu.status import SolveStatus


def make_prob(m, n, seed, dtype=jnp.float64):
    A, b, c = random_dense_lp(m, n, seed=seed, dtype=np.float64)
    return Problem(jnp.asarray(A, dtype), jnp.asarray(b, dtype), jnp.asarray(c, dtype))


@pytest.mark.parametrize("m,n,seed", [(5, 12, 0), (16, 40, 1), (32, 100, 2)])
def test_incremental_updates_match_recompute(m, n, seed):
    opts = SimplexOptions(dtype=jnp.float64)
    backend = get_backend("xla")
    prob = make_prob(m, n, seed)
    state = initial_state_slack(prob, jnp.float64)

    for _ in range(60):
        state = pivot_step(prob, state, opts, backend)
        if int(state.status) != SolveStatus.RUNNING:
            break
        B = np.asarray(prob.A)[:, np.asarray(state.basis)]
        B_inv_true = np.linalg.inv(B)
        np.testing.assert_allclose(np.asarray(state.B_inv), B_inv_true, atol=1e-8)
        np.testing.assert_allclose(
            np.asarray(state.y), np.asarray(state.c_b) @ B_inv_true, atol=1e-8
        )
        np.testing.assert_allclose(
            np.asarray(state.x_b), B_inv_true @ np.asarray(prob.b), atol=1e-8
        )
        # primal feasibility maintained
        assert np.all(np.asarray(state.x_b) >= -1e-9)


def test_objective_monotone_nondecreasing():
    # Dantzig pricing on a nondegenerate LP: z strictly increases per pivot.
    opts = SimplexOptions(dtype=jnp.float64)
    backend = get_backend("xla")
    prob = make_prob(8, 24, 3)
    state = initial_state_slack(prob, jnp.float64)
    z_prev = float(state.c_b @ state.x_b)
    for _ in range(100):
        state = pivot_step(prob, state, opts, backend)
        if int(state.status) != SolveStatus.RUNNING:
            break
        z = float(state.c_b @ state.x_b)
        assert z >= z_prev - 1e-12
        z_prev = z
    assert int(state.status) == SolveStatus.OPTIMAL


def test_terminal_state_is_fixed_point():
    opts = SimplexOptions(dtype=jnp.float64)
    backend = get_backend("xla")
    prob = make_prob(6, 15, 4)
    state = initial_state_slack(prob, jnp.float64)
    for _ in range(200):
        state = pivot_step(prob, state, opts, backend)
        if int(state.status) != SolveStatus.RUNNING:
            break
    assert int(state.status) == SolveStatus.OPTIMAL
    frozen = pivot_step(prob, state, opts, backend)
    # a terminal state must not mutate numeric fields
    np.testing.assert_array_equal(np.asarray(frozen.basis), np.asarray(state.basis))
    np.testing.assert_allclose(np.asarray(frozen.x_b), np.asarray(state.x_b))
    assert int(frozen.iters) == int(state.iters)


def test_refactorize_restores_exact_inverse():
    opts = SimplexOptions(dtype=jnp.float64)
    backend = get_backend("xla")
    prob = make_prob(12, 30, 5)
    state = initial_state_slack(prob, jnp.float64)
    for _ in range(10):
        state = pivot_step(prob, state, opts, backend)
        if int(state.status) != SolveStatus.RUNNING:
            break
    state_r = refactorize(prob, state, backend)
    B = np.asarray(prob.A)[:, np.asarray(state_r.basis)]
    np.testing.assert_allclose(
        np.asarray(state_r.B_inv) @ B, np.eye(B.shape[0]), atol=1e-9
    )
