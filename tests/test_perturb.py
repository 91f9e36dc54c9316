"""Anti-degeneracy RHS perturbation (``SimplexOptions.perturb_after``).

The production-solver cure for degenerate stalling (HiGHS/CPLEX perturb
costs/bounds the same way): after a long degenerate streak, every basic
value is shifted into the feasible interior by a tiny deterministic amount
and the tracked rhs moves with it (``B x_b = b_eff + w`` stays EXACT), so
every subsequent pivot makes real progress on the perturbed problem. The
shift is cleared — and the true rhs restored by refactorization — before
any terminal status is certified, so these tests pin two contracts:

1. answers are IDENTICAL-quality to the unperturbed path (oracle parity,
   certified against the TRUE rhs);
2. the algebraic invariant holds at activation and the record never leaks
   into snapshots.

No reference counterpart: the reference solver has no anti-cycling or
anti-degeneracy machinery at all (SURVEY.md §2 — its ratio test is the
plain textbook min-ratio, src/v1_baseline.cu).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from simplex_tpu import SimplexOptions, SolveStatus, solve
from simplex_tpu.oracle.generator import degenerate_streak_lp, random_dense_lp
from simplex_tpu.oracle.reference import relative_gap, solve_scipy


def _solve_final_state(A, b, c, opts, max_iter=4096):
    """Run solve_state directly so the final SolverState (incl. the
    perturbation record) is observable."""
    from simplex_tpu.core.solver import solve_state
    from simplex_tpu.core.state import Problem, initial_state_slack

    prob = Problem(
        jnp.asarray(A, opts.dtype),
        jnp.asarray(b, opts.dtype),
        jnp.asarray(c, opts.dtype),
    )
    state0 = initial_state_slack(
        prob, opts.dtype, opts.pricing, opts.resolve_defer(),
        multi_price=opts.multi_price, perturb=opts.perturb_after > 0,
    )
    return solve_state(prob, state0, opts, jnp.int32(max_iter))


@pytest.mark.parametrize("seed", [5, 9, 13])
def test_perturb_degenerate_matches_oracle(seed):
    # a degenerate-streak LP with an aggressive gate: the perturbation must
    # fire and the certified answer must still meet the oracle parity gate
    A, b, c = degenerate_streak_lp(seed=seed)
    ref = solve_scipy(A, b, c)
    res = solve(
        A, b, c,
        options=SimplexOptions(perturb_after=2, refactor_every=32),
    )
    assert res.status == SolveStatus.OPTIMAL
    assert relative_gap(res.z, ref.z) < 1e-4
    np.testing.assert_allclose(A @ res.x, b, atol=1e-3)
    assert np.all(res.x >= -1e-4)


def test_perturb_activates_and_is_cleared_at_terminal():
    # observable contract: the gate actually fires on a degenerate LP, and
    # the verify rounds clear the shift before certifying (on=False, w=0)
    A, b, c = degenerate_streak_lp(seed=5)
    opts = SimplexOptions(perturb_after=2, refactor_every=32)
    final = _solve_final_state(A, b, c, opts)
    assert int(final.status) == int(SolveStatus.OPTIMAL)
    assert int(final.pert.rounds) >= 1  # it fired
    assert not bool(final.pert.on)  # and was cleared before certifying
    np.testing.assert_allclose(np.asarray(final.pert.w), 0.0)
    # the certified x_b solves the TRUE rhs (refactorized after clearing)
    resid = A[:, np.asarray(final.basis)] @ np.asarray(final.x_b) - b
    assert np.abs(resid).max() < 1e-3


@pytest.mark.parametrize("grow", [1.0, 2.0, 8.0])
def test_perturb_escalation_keeps_oracle_parity(grow):
    """Round 5: re-arms escalate the shift geometrically (perturb_grow).
    The exact-accounting invariant (B x = b_eff + w, cleared before any
    certified status) is magnitude-independent, so even aggressive growth
    (8^k, i.e. ~0.1-relative shifts within a few re-arms) must certify the
    same oracle-parity answer; 1.0 pins the legacy fixed-scale behavior."""
    A, b, c = degenerate_streak_lp(seed=5)
    ref = solve_scipy(A, b, c)
    opts = SimplexOptions(
        perturb_after=2, refactor_every=32, perturb_grow=grow
    )
    final = _solve_final_state(A, b, c, opts)
    assert int(final.status) == int(SolveStatus.OPTIMAL)
    assert int(final.pert.rounds) >= 1  # the gate fired (re-arms possible)
    assert not bool(final.pert.on)
    np.testing.assert_allclose(np.asarray(final.pert.w), 0.0)
    z = float(np.asarray(final.c_b) @ np.asarray(final.x_b))
    assert relative_gap(z, ref.z) < 1e-3


def test_perturb_nondegenerate_never_fires():
    A, b, c = random_dense_lp(16, 40, seed=7, dtype=np.float32)
    final = _solve_final_state(A, b, c, SimplexOptions(perturb_after=48))
    assert int(final.status) == int(SolveStatus.OPTIMAL)
    assert int(final.pert.rounds) == 0


def test_perturb_disabled_has_no_record():
    A, b, c = random_dense_lp(8, 20, seed=3, dtype=np.float32)
    final = _solve_final_state(A, b, c, SimplexOptions(perturb_after=0))
    assert final.pert is None
    assert int(final.status) == int(SolveStatus.OPTIMAL)


def test_perturb_activate_invariant_exact():
    # algebraic contract of one activation: delta > 0, and w accumulates
    # exactly B @ delta so B x_b' = b + w holds to fp roundoff
    from simplex_tpu.core.solver import solve_state  # noqa: F401 (import path)
    from simplex_tpu.core.state import Problem, initial_state_slack
    from simplex_tpu.core.step import perturb_activate, perturb_clear
    from simplex_tpu.kernels.dispatch import get_backend

    A, b, c = random_dense_lp(12, 30, seed=5, dtype=np.float32)
    prob = Problem(jnp.asarray(A), jnp.asarray(b), jnp.asarray(c))
    state = initial_state_slack(prob, jnp.float32, perturb=True)
    st2 = perturb_activate(prob, state, get_backend("xla"), 1e-4)
    delta = np.asarray(st2.x_b) - np.asarray(state.x_b)
    assert np.all(delta > 0)  # strictly into the interior (unbounded case)
    assert bool(st2.pert.on) and int(st2.pert.rounds) == 1
    B = A[:, np.asarray(st2.basis)]
    lhs = B @ np.asarray(st2.x_b, np.float64)
    rhs = b + np.asarray(st2.pert.w, np.float64)
    assert np.abs(lhs - rhs).max() < 1e-4 * max(1.0, np.abs(b).max())
    # clear drops the record (caller refactorizes right after)
    st3 = perturb_clear(st2)
    assert not bool(st3.pert.on)
    np.testing.assert_allclose(np.asarray(st3.pert.w), 0.0)


def test_perturb_bounded_lp_respects_bounds():
    # native bounded-variable rule: the shift aims into the interior and is
    # capped at a quarter of the room, so no perturbed point crosses a bound
    rng = np.random.default_rng(21)
    m, n = 12, 36
    A = rng.uniform(0.1, 1.0, (m, n)).astype(np.float32)
    A[:, n - m:] = np.eye(m, dtype=np.float32)
    b = rng.uniform(5.0, 10.0, m).astype(np.float32)
    c = np.concatenate([rng.uniform(0.5, 2.0, n - m), np.zeros(m)]).astype(
        np.float32
    )
    u = np.full(n, np.inf)
    u[: n - m] = rng.uniform(0.2, 1.5, n - m)
    from scipy.optimize import linprog

    ref = linprog(
        -np.asarray(c, np.float64),
        A_eq=np.asarray(A, np.float64),
        b_eq=np.asarray(b, np.float64),
        bounds=[(0.0, None if not np.isfinite(ub) else float(ub)) for ub in u],
        method="highs",
    )
    assert ref.status == 0
    res = solve(
        A, b, c, u=u, options=SimplexOptions(perturb_after=2)
    )
    assert res.status == SolveStatus.OPTIMAL
    assert relative_gap(res.z, -ref.fun) < 1e-5


def test_perturb_composes_with_flagship_stack():
    # bf16 shadow pricing + deferred rank-L updates + multiple pricing +
    # the perturbation gate all active at once — the flagship composition
    A, b, c = degenerate_streak_lp(32, 96, seed=13)
    ref = solve_scipy(A, b, c)
    res = solve(
        A, b, c,
        options=SimplexOptions(
            multi_price=8, pricing_dtype="bfloat16", update_defer=4,
            refactor_every=32, perturb_after=4,
        ),
    )
    assert res.status == SolveStatus.OPTIMAL
    assert relative_gap(res.z, ref.z) < 1e-4


def test_perturb_cleared_on_no_verify_exit():
    # verify_terminal=False skips the clearing rounds entirely — the final
    # unconditional drop must still return x_b for the TRUE rhs (round-4
    # advisor: plain solve could return the shifted point, error ~scale)
    A, b, c = degenerate_streak_lp(seed=5)
    opts = SimplexOptions(
        perturb_after=2, refactor_every=32, verify_terminal=False
    )
    final = _solve_final_state(A, b, c, opts)
    assert int(final.pert.rounds) >= 1  # it fired
    assert not bool(final.pert.on)  # and was dropped before returning
    np.testing.assert_allclose(np.asarray(final.pert.w), 0.0)
    resid = A[:, np.asarray(final.basis)] @ np.asarray(final.x_b) - b
    assert np.abs(resid).max() < 1e-3


def test_perturb_cleared_on_max_iter_exit():
    # a budget exhausted mid-perturbation must not leak the shifted point
    A, b, c = degenerate_streak_lp(seed=9)
    opts = SimplexOptions(perturb_after=1)
    final = _solve_final_state(A, b, c, opts, max_iter=6)
    assert int(final.status) == int(SolveStatus.MAX_ITER)
    assert int(final.pert.rounds) >= 1
    assert not bool(final.pert.on)
    resid = A[:, np.asarray(final.basis)] @ np.asarray(final.x_b) - b
    assert np.abs(resid).max() < 1e-3


def test_perturb_checkpoint_snapshot_never_carries_shift(tmp_path):
    # chunked solve with a hair-trigger gate: snapshots must satisfy the
    # TRUE-rhs invariant (validate_checkpoint) even when a chunk budget
    # runs out mid-perturbation, and resume must reach the optimum
    from simplex_tpu.core.checkpoint import (
        load_checkpoint,
        solve_with_checkpoints,
        validate_checkpoint,
    )

    A, b, c = degenerate_streak_lp(24, 64, seed=17)
    ref = solve_scipy(A, b, c)
    path = tmp_path / "ckpt.npz"
    opts = SimplexOptions(perturb_after=1, checkpoint_every=4)
    res = solve_with_checkpoints(A, b, c, path=path, options=opts)
    assert res.status == SolveStatus.OPTIMAL
    assert relative_gap(res.z, ref.z) < 1e-4
    st = load_checkpoint(path, A=A, b=b, c=c)
    assert st.pert is None  # never serialized
    validate_checkpoint(st, A, b)  # true-rhs invariant holds
    res2 = solve_with_checkpoints(A, b, c, path=path, options=opts)
    assert res2.status == SolveStatus.OPTIMAL
    assert relative_gap(res2.z, ref.z) < 1e-4


def test_perturb_drop_before_snapshot_restores_true_rhs():
    # unit test of the pre-snapshot drop: activate, then _drop_pert_jit must
    # zero the record and re-derive x_b from the TRUE rhs
    import dataclasses

    from simplex_tpu.core.checkpoint import _drop_pert_jit
    from simplex_tpu.core.state import Problem, initial_state_slack
    from simplex_tpu.core.step import perturb_activate
    from simplex_tpu.kernels.dispatch import get_backend

    A, b, c = random_dense_lp(12, 30, seed=9, dtype=np.float32)
    prob = Problem(jnp.asarray(A), jnp.asarray(b), jnp.asarray(c))
    state = initial_state_slack(prob, jnp.float32, perturb=True)
    x0 = np.asarray(state.x_b)
    st = perturb_activate(prob, state, get_backend("xla"), 1e-3)
    assert np.abs(np.asarray(st.x_b) - x0).max() > 0
    opts = dataclasses.replace(SimplexOptions(), max_iter=0)
    st2 = _drop_pert_jit(
        jnp.asarray(A), jnp.asarray(b), jnp.asarray(c), st, opts
    )
    assert not bool(st2.pert.on)
    np.testing.assert_allclose(np.asarray(st2.pert.w), 0.0)
    np.testing.assert_allclose(np.asarray(st2.x_b), x0, atol=1e-5)
