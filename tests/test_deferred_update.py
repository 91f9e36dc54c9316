"""Deferred (lazy rank-L) B_inv updates: exactness and parity.

``SimplexOptions.update_defer=L`` keeps up to L pending (eta, row) pairs and
applies them as one rank-L GEMM instead of L separate O(m^2) rank-1 passes.
The telescoped product form  B_k = B_0 + sum_j eta_j (x) r_j  is exact, so
the pivot path must match the eager solver's bit-for-bit decisions up to fp
reassociation — these tests pin objective parity, state equivalence after a
flush, and interop with refactorization / bf16 pricing / devex / batching.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from simplex_tpu import SimplexOptions, SolveStatus, solve
from simplex_tpu.oracle.generator import random_dense_lp
from simplex_tpu.oracle.reference import relative_gap, solve_scipy


@pytest.mark.parametrize("L", [1, 3, 8])
@pytest.mark.parametrize("m,n", [(4, 10), (16, 40), (48, 120)])
def test_defer_matches_oracle(L, m, n):
    A, b, c = random_dense_lp(m, n, seed=2, dtype=np.float32)
    ref = solve_scipy(A, b, c)
    res = solve(A, b, c, options=SimplexOptions(update_defer=L, refactor_every=64))
    assert res.status == SolveStatus.OPTIMAL
    assert relative_gap(res.z, ref.z) < 1e-5


@pytest.mark.parametrize("L", [2, 5])
def test_defer_matches_eager_path(L):
    # identical pivot path and (materialized) inverse as the eager solver
    A, b, c = random_dense_lp(12, 30, seed=9, dtype=np.float64)
    eager = solve(
        A, b, c, options=SimplexOptions(dtype=jnp.float64, verify_terminal=False)
    )
    lazy = solve(
        A, b, c,
        options=SimplexOptions(
            dtype=jnp.float64, update_defer=L, verify_terminal=False
        ),
    )
    assert lazy.status == eager.status == SolveStatus.OPTIMAL
    assert lazy.iters == eager.iters
    np.testing.assert_array_equal(lazy.basis, eager.basis)
    np.testing.assert_allclose(lazy.x_b, eager.x_b, rtol=1e-9, atol=1e-12)


def test_defer_state_materializes_true_inverse():
    # run k < L pivots so pending pairs are live, then check
    # B_inv + U.T @ R == inv(A[:, basis]) exactly (f64).
    import jax

    from simplex_tpu.core.solver import solve_state
    from simplex_tpu.core.state import Problem, initial_state_slack

    A, b, c = random_dense_lp(10, 24, seed=4, dtype=np.float64)
    opts = SimplexOptions(dtype=jnp.float64, update_defer=16, verify_terminal=False)
    prob = Problem(jnp.asarray(A), jnp.asarray(b), jnp.asarray(c))
    state0 = initial_state_slack(prob, jnp.float64, update_defer=16)
    final = jax.jit(
        lambda p, s: solve_state(p, s, opts, max_iter=5)
    )(prob, state0)
    k = int(final.npend)
    assert 0 < k <= 5
    B_true = np.asarray(final.B_inv) + np.asarray(final.U).T @ np.asarray(final.R)
    B_exact = np.linalg.inv(A[:, np.asarray(final.basis)])
    np.testing.assert_allclose(B_true, B_exact, rtol=1e-8, atol=1e-10)


def test_defer_with_bf16_pricing_and_devex():
    A, b, c = random_dense_lp(32, 80, seed=6, dtype=np.float32)
    ref = solve_scipy(A, b, c)
    for pricing in ("dantzig", "devex"):
        res = solve(
            A, b, c,
            options=SimplexOptions(
                update_defer=4,
                pricing=pricing,
                pricing_dtype="bfloat16",
                refactor_every=48,
            ),
        )
        assert res.status == SolveStatus.OPTIMAL, pricing
        assert relative_gap(res.z, ref.z) < 1e-5, pricing


def test_defer_degenerate_bland():
    A, b, c = random_dense_lp(24, 60, seed=11, dtype=np.float32, degenerate=True)
    ref = solve_scipy(A, b, c)
    res = solve(
        A, b, c,
        options=SimplexOptions(update_defer=4, bland_after=8, refactor_every=32),
    )
    assert res.status == SolveStatus.OPTIMAL
    assert relative_gap(res.z, ref.z) < 1e-4


def test_defer_unbounded():
    A = np.array([[1.0, -1.0, 1.0]], np.float32)
    b = np.array([1.0], np.float32)
    c = np.array([1.0, 1.0, 0.0], np.float32)
    res = solve(A, b, c, options=SimplexOptions(update_defer=4))
    assert res.status == SolveStatus.UNBOUNDED


def test_defer_checkpoint_roundtrip(tmp_path):
    from simplex_tpu.core.checkpoint import solve_with_checkpoints

    A, b, c = random_dense_lp(16, 40, seed=8, dtype=np.float32)
    ref = solve_scipy(A, b, c)
    opts = SimplexOptions(update_defer=4, checkpoint_every=8)
    res = solve_with_checkpoints(A, b, c, path=tmp_path / "ckpt.npz", options=opts)
    assert res.status == SolveStatus.OPTIMAL
    assert relative_gap(res.z, ref.z) < 1e-4


def test_defer_batched():
    from simplex_tpu.batch.vmapped import solve_batched

    lps = [random_dense_lp(8, 20, seed=s, dtype=np.float32) for s in range(3)]
    As = np.stack([lp[0] for lp in lps])
    bs = np.stack([lp[1] for lp in lps])
    cs = np.stack([lp[2] for lp in lps])
    res = solve_batched(As, bs, cs, options=SimplexOptions(update_defer=4))
    for i in range(3):
        ref = solve_scipy(As[i], bs[i], cs[i])
        assert SolveStatus(int(res.status[i])) == SolveStatus.OPTIMAL
        assert relative_gap(float(res.z[i]), ref.z) < 1e-4


def test_defer_sharded():
    import jax

    from simplex_tpu.dist.mesh import COLS_AXIS, make_mesh
    from simplex_tpu.dist.sharded import solve_sharded

    mesh = make_mesh(axis_names=(COLS_AXIS,), devices=jax.devices()[:4])
    A, b, c = random_dense_lp(12, 32, seed=3, dtype=np.float32)
    ref = solve_scipy(A, b, c)
    res = solve_sharded(A, b, c, mesh, options=SimplexOptions(update_defer=4))
    assert res.status == SolveStatus.OPTIMAL
    assert relative_gap(res.z, ref.z) < 1e-4
