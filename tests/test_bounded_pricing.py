"""Devex / exact steepest-edge pricing under the native bounded-variable
rule (round-3: lifts the dantzig-only restriction of the first bounded
implementation).

The incremental state is bound-agnostic — e_j = y.A_j - c_j never carries
the at-upper sign (it flips at selection only) and both weight recurrences
depend on basis geometry alone, which bound-flip pivots do not touch — so
the proofs here are (a) objective parity with the dantzig-bounded solve
and the f64 oracle, and (b) per-pivot EXACTNESS of the steepest-edge norms
across a pivot sequence that includes real bound flips.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from simplex_tpu import SimplexOptions, solve
from simplex_tpu.oracle.reference import relative_gap
from simplex_tpu.status import SolveStatus


def _bounded_lp(m, k, seed, tight=0.6):
    """Sparse-cost canonical LP with binding upper bounds on the real
    columns (slacks unbounded), feasible at the slack basis."""
    rng = np.random.default_rng(seed)
    A0 = rng.uniform(0.2, 1.5, (m, k))
    A = np.hstack([A0, np.eye(m)]).astype(np.float32)
    b = (A0 @ rng.uniform(0.2, 0.8, k) + rng.uniform(0.1, 1.0, m)).astype(
        np.float32
    )
    c = np.concatenate([rng.uniform(0.5, 2, k), np.zeros(m)]).astype(
        np.float32
    )
    # tight enough that several columns park at their upper bound
    u = np.concatenate(
        [rng.uniform(0.1, tight, k), np.full(m, np.inf)]
    ).astype(np.float32)
    return A, b, c, u


@pytest.mark.parametrize("pricing", ["devex", "steepest"])
@pytest.mark.parametrize("seed", [0, 1, 2])
def test_bounded_pricing_matches_dantzig_and_oracle(pricing, seed):
    from scipy.optimize import linprog

    A, b, c, u = _bounded_lp(12, 30, seed=100 + seed)
    base = solve(A, b, c, u=u)
    res = solve(A, b, c, u=u, options=SimplexOptions(pricing=pricing))
    assert base.status == res.status == SolveStatus.OPTIMAL
    assert relative_gap(res.z, base.z) < 1e-5
    r = linprog(
        -np.asarray(c, np.float64),
        A_eq=np.asarray(A, np.float64),
        b_eq=np.asarray(b, np.float64),
        bounds=[(0, float(uj) if np.isfinite(uj) else None) for uj in u],
        method="highs",
    )
    assert r.status == 0
    assert relative_gap(res.z, -r.fun) < 1e-5
    assert res.feas_err < 1e-4


@pytest.mark.parametrize("pricing", ["devex", "steepest"])
def test_bounded_pricing_flips_happen(pricing):
    """The parity above must cover the bound-flip outcome: with very tight
    bounds the pivot count under any pricing exceeds the basis-change count
    a bounds-free LP would need, and at least one nonbasic column ends at
    its upper bound."""
    A, b, c, u = _bounded_lp(10, 40, seed=7, tight=0.25)
    res = solve(A, b, c, u=u, options=SimplexOptions(pricing=pricing))
    assert res.status == SolveStatus.OPTIMAL
    assert res.at_upper is not None and res.at_upper.any()


def test_bounded_steepest_gamma_exact_per_pivot():
    """gamma_j == 1 + ||B^{-1} A_j||^2 after EVERY pivot — including across
    bound-flip steps, which must leave gamma untouched (basis unchanged)."""
    from simplex_tpu.core.state import Problem, initial_state_slack
    from simplex_tpu.core.step import pivot_step
    from simplex_tpu.kernels.dispatch import get_backend

    A, b, c, u = _bounded_lp(8, 20, seed=5, tight=0.3)
    A64, b64, c64, u64 = (np.asarray(v, np.float64) for v in (A, b, c, u))
    opts = SimplexOptions(pricing="steepest", dtype=jnp.float64)
    prob = Problem(
        A=jnp.asarray(A64), b=jnp.asarray(b64), c=jnp.asarray(c64),
        u=jnp.asarray(u64),
    )
    state = initial_state_slack(prob, jnp.float64, pricing="steepest")
    backend = get_backend("xla")
    flips = 0
    prev_basis = np.asarray(state.basis).copy()
    for _ in range(200):
        state = pivot_step(prob, state, opts, backend)
        if int(state.status) != int(SolveStatus.RUNNING):
            break
        basis = np.asarray(state.basis)
        if (basis == prev_basis).all():
            flips += 1
        prev_basis = basis.copy()
        T = np.linalg.solve(A64[:, basis], A64)
        gamma_ref = 1 + np.sum(T * T, axis=0)
        nonbasic = np.ones(A64.shape[1], bool)
        nonbasic[basis] = False
        np.testing.assert_allclose(
            np.asarray(state.gamma)[nonbasic],
            gamma_ref[nonbasic],
            rtol=1e-8,
            err_msg=f"after pivot {int(state.iters)}",
        )
    assert int(state.iters) >= 3
    assert int(state.status) == int(SolveStatus.OPTIMAL)


@pytest.mark.parametrize("pricing", ["devex", "steepest"])
def test_bounded_pricing_batched(pricing):
    """The vmapped batch path runs the same pivot_step; its bounded guard
    is lifted with the single-chip one."""
    from simplex_tpu.batch.vmapped import solve_batched

    A, b, c, u = _bounded_lp(6, 16, seed=9)
    B = 4
    rng = np.random.default_rng(11)
    bs = np.stack([b * rng.uniform(0.9, 1.1) for _ in range(B)])
    res = solve_batched(
        np.broadcast_to(A, (B,) + A.shape).copy(), bs,
        np.broadcast_to(c, (B,) + c.shape).copy(),
        u=u, options=SimplexOptions(pricing=pricing),
    )
    singles = [solve(A, bs[i], c, u=u) for i in range(B)]
    for i in range(B):
        assert SolveStatus(int(res.status[i])) == SolveStatus.OPTIMAL
        assert relative_gap(float(res.z[i]), singles[i].z) < 1e-4


def test_bounded_devex_dual_warm_restart():
    """solve_dual's bounded guard is lifted too: a perturbed-RHS re-solve
    under devex matches the cold solve."""
    from simplex_tpu.core.dual import solve_dual

    A, b, c, u = _bounded_lp(10, 24, seed=13)
    opts = SimplexOptions(pricing="devex")
    cold = solve(A, b, c, u=u, options=opts)
    assert cold.status == SolveStatus.OPTIMAL
    b2 = b * 1.05
    warm = solve_dual(
        A, b2, c, u=u, basis0=cold.basis, at_upper0=cold.at_upper,
        options=opts,
    )
    cold2 = solve(A, b2, c, u=u, options=opts)
    assert warm.status == cold2.status == SolveStatus.OPTIMAL
    assert relative_gap(warm.z, cold2.z) < 1e-5
