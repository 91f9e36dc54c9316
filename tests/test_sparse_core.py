"""Fully sparse simplex core: ``solve()`` with a BlockSparse / scipy A.

Round-3 roadmap item #2 second half: beyond the pricing *shadow*
(pricing_sparse), dense A never materializes on device at all — pricing,
ftran column gathers, the effective rhs, and refactorization's basis
matrix all read the stored tiles only, and the host polish assembles
basis columns from the (host-pulled) tiles. Everything here is pinned
against the dense solve and the scipy oracle.
"""

import numpy as np
import pytest
import scipy.sparse as sps

from simplex_tpu import SimplexOptions, solve
from simplex_tpu import sparse as bsp
from simplex_tpu.oracle.reference import relative_gap, solve_scipy
from simplex_tpu.status import SolveStatus

from tests.test_sparse import _random_block_sparse, _sparse_canonical


# ---------------------------------------------------------------- gathers


def test_gather_column_matches_dense():
    A, M = _random_block_sparse(30, 70, 0.1, seed=11)
    for j in (0, 3, 29, 31, 69):
        np.testing.assert_allclose(
            np.asarray(bsp.gather_column(M, j)), A[:, j], atol=0
        )


def test_gather_columns_matches_dense_and_chunks():
    A, M = _random_block_sparse(40, 90, 0.08, seed=12)
    idx = np.array([0, 5, 5, 33, 89, 17, 2], np.int32)
    np.testing.assert_allclose(
        np.asarray(bsp.gather_columns(M, idx)), A[:, idx], atol=0
    )
    # chunked path (chunk < k exercises the lax.map + repack)
    np.testing.assert_allclose(
        np.asarray(bsp.gather_columns(M, idx, chunk=3)), A[:, idx], atol=0
    )


def test_gather_columns_host_matches_dense():
    A, M = _random_block_sparse(25, 50, 0.15, seed=13)
    idx = np.array([1, 24, 49, 8])
    np.testing.assert_allclose(
        bsp.gather_columns_host(M, idx), A[:, idx].astype(np.float64), atol=0
    )


# ---------------------------------------------------------------- solves


def _check_against_oracle(A_dense, b, c, res):
    ref = solve_scipy(A_dense, b, c)
    assert ref.status == SolveStatus.OPTIMAL
    assert res.status == SolveStatus.OPTIMAL
    assert relative_gap(res.z, ref.z) < 1e-5
    assert res.feas_err < 1e-5
    return ref


def test_solve_sparse_matches_oracle():
    A, b, c = _sparse_canonical(24, 60, density=0.2, seed=21)
    M = bsp.from_dense(A, block_shape=(16, 16))
    res = solve(M, b, c, options=SimplexOptions(refactor_every=16))
    _check_against_oracle(A, b, c, res)


def test_solve_sparse_scipy_input():
    A, b, c = _sparse_canonical(16, 40, density=0.25, seed=22)
    res = solve(sps.csr_matrix(A), b, c)
    _check_against_oracle(A, b, c, res)


def test_solve_sparse_bf16_shadow():
    A, b, c = _sparse_canonical(24, 60, density=0.2, seed=23)
    M = bsp.from_dense(A, block_shape=(16, 16))
    res = solve(M, b, c, options=SimplexOptions(pricing_dtype="bfloat16"))
    _check_against_oracle(A, b, c, res)


def test_solve_sparse_multi_price_and_defer():
    A, b, c = _sparse_canonical(32, 80, density=0.15, seed=24)
    M = bsp.from_dense(A, block_shape=(16, 16))
    res = solve(
        M, b, c,
        options=SimplexOptions(multi_price=4, update_defer=4,
                               refactor_every=32),
    )
    _check_against_oracle(A, b, c, res)


def test_solve_sparse_bounded():
    rng = np.random.default_rng(25)
    m, k = 10, 24
    A0 = rng.uniform(0.2, 1.5, (m, k))
    A0[rng.uniform(size=A0.shape) > 0.3] = 0.0
    A = np.hstack([A0, np.eye(m)]).astype(np.float32)
    b = (A0 @ rng.uniform(0.2, 0.8, k) + rng.uniform(0.1, 1.0, m)).astype(
        np.float32
    )
    c = np.concatenate([rng.uniform(0.5, 2, k), np.zeros(m)]).astype(
        np.float32
    )
    u = np.concatenate(
        [rng.uniform(0.3, 1.0, k), np.full(m, np.inf)]
    ).astype(np.float32)
    base = solve(A, b, c, u=u)
    M = bsp.from_dense(A, block_shape=(8, 8))
    res = solve(M, b, c, u=u)
    assert res.status == base.status == SolveStatus.OPTIMAL
    assert relative_gap(res.z, base.z) < 1e-5
    assert res.feas_err < 1e-5


def test_solve_sparse_general_basis0():
    """Non-slack starting basis routes through initial_state's sparse
    basis-matrix gather + O(m^3) init solve."""
    A, b, c = _sparse_canonical(12, 30, density=0.3, seed=26)
    ref = solve(A, b, c)
    M = bsp.from_dense(A, block_shape=(8, 8))
    # warm-start the sparse solve from the dense solve's optimal basis:
    # 0 pivots expected, identical objective
    res = solve(M, b, c, basis0=ref.basis)
    assert res.status == SolveStatus.OPTIMAL
    assert relative_gap(res.z, ref.z) < 1e-6
    assert res.iters <= 2


def test_solve_sparse_guards():
    A, b, c = _sparse_canonical(8, 20, density=0.3, seed=27)
    M = bsp.from_dense(A, block_shape=(8, 8))
    with pytest.raises(NotImplementedError, match="backend"):
        solve(M, b, c, options=SimplexOptions(backend="pallas"))


def test_solve_sparse_segmented_pricing():
    """Segmented (partial) pricing runs over per-segment tile structures
    (sparse.split_columns): same oracle answer as the full tile pass, in
    both pricing dtypes; indivisible segment widths silently fall back to
    the full pass like the dense gate does."""
    A, b, c = _sparse_canonical(24, 64, density=0.25, seed=34)
    c = c * (A != 0).any(axis=0)
    M = bsp.from_dense(A, block_shape=(8, 8))
    ref = solve_scipy(A, b, c)
    assert ref.status == SolveStatus.OPTIMAL
    for pdtype in ("float32", "bfloat16"):
        res = solve(
            M, b, c,
            options=SimplexOptions(
                partial_pricing=4, partial_min_segment=1,
                pricing_dtype=pdtype,
            ),
        )
        assert res.status == SolveStatus.OPTIMAL, pdtype
        assert relative_gap(res.z, ref.z) < 1e-5, pdtype
    # segment width 64/5 not an integer: inactive, still correct
    res = solve(
        M, b, c,
        options=SimplexOptions(partial_pricing=5, partial_min_segment=1),
    )
    assert res.status == SolveStatus.OPTIMAL
    assert relative_gap(res.z, ref.z) < 1e-5


def test_solve_sparse_segmented_bounded():
    """The bounded rule's segmented branch reads tiles too."""
    rng = np.random.default_rng(35)
    m, k = 8, 24
    A0 = rng.uniform(0.2, 1.5, (m, k))
    A0[rng.uniform(size=A0.shape) > 0.4] = 0.0
    A = np.hstack([A0, np.eye(m)]).astype(np.float32)
    b = (A0 @ rng.uniform(0.2, 0.8, k) + rng.uniform(0.1, 1.0, m)).astype(
        np.float32
    )
    c = np.concatenate([rng.uniform(0.5, 2, k), np.zeros(m)]).astype(
        np.float32
    )
    c[:k] *= (A0 != 0).any(axis=0)
    u = np.concatenate(
        [rng.uniform(0.3, 1.0, k), np.full(m, np.inf)]
    ).astype(np.float32)
    base = solve(A, b, c, u=u)
    M = bsp.from_dense(A, block_shape=(8, 8))
    res = solve(
        M, b, c, u=u,
        options=SimplexOptions(partial_pricing=4, partial_min_segment=1),
    )
    assert res.status == base.status == SolveStatus.OPTIMAL
    assert relative_gap(res.z, base.z) < 1e-5


@pytest.mark.parametrize("pricing", ["devex", "steepest"])
def test_solve_sparse_weighted_pricing(pricing):
    """devex / exact steepest-edge run on tiles too: the incremental
    pricing pass (pricing_update) and the init/refactorize reduced-cost
    recomputes are tile rmatvecs; steepest init at a general basis gathers
    column chunks for the (m, m) x (m, chunk) norm GEMMs."""
    A, b, c = _sparse_canonical(24, 60, density=0.2, seed=29)
    M = bsp.from_dense(A, block_shape=(16, 16))
    res = solve(
        M, b, c, options=SimplexOptions(pricing=pricing, refactor_every=16)
    )
    ref = _check_against_oracle(A, b, c, res)
    # general (non-slack) starting basis exercises the sparse steepest init
    res2 = solve(M, b, c, basis0=ref_basis(res), options=SimplexOptions(
        pricing=pricing))
    assert res2.status == SolveStatus.OPTIMAL
    assert relative_gap(res2.z, res.z) < 1e-6


def ref_basis(res):
    return res.basis


def test_sparse_steepest_gamma_exact_per_pivot():
    """Sparse steepest maintains the same EXACT Goldfarb-Reid norms as the
    dense path: pinned against from-scratch f64 recomputation per pivot."""
    import jax.numpy as jnp

    from simplex_tpu.core.state import Problem, initial_state_slack
    from simplex_tpu.core.step import pivot_step
    from simplex_tpu.kernels.dispatch import get_backend

    rng = np.random.default_rng(30)
    m, kk = 10, 24
    A0 = rng.uniform(0.2, 1.5, (m, kk))
    A0[rng.uniform(size=A0.shape) > 0.4] = 0.0
    A = np.hstack([A0, np.eye(m)])
    b = A0 @ rng.uniform(0.2, 0.8, kk) + rng.uniform(0.1, 1.0, m)
    c = np.concatenate([rng.uniform(0.5, 2, kk), np.zeros(m)])
    M = bsp.from_dense(A, block_shape=(8, 8), dtype=jnp.float64)
    opts = SimplexOptions(pricing="steepest", dtype=jnp.float64)
    prob = Problem(A=M, b=jnp.asarray(b), c=jnp.asarray(c))
    state = initial_state_slack(prob, jnp.float64, pricing="steepest")
    backend = get_backend("xla")
    from simplex_tpu.status import SolveStatus as _SS

    for _ in range(100):
        state = pivot_step(prob, state, opts, backend)
        if int(state.status) != int(_SS.RUNNING):
            break
        basis = np.asarray(state.basis)
        T = np.linalg.solve(A[:, basis], A)
        gamma_ref = 1 + np.sum(T * T, axis=0)
        nonbasic = np.ones(A.shape[1], bool)
        nonbasic[basis] = False
        np.testing.assert_allclose(
            np.asarray(state.gamma)[nonbasic], gamma_ref[nonbasic], rtol=1e-8
        )
    assert int(state.iters) >= 3
    assert int(state.status) == int(_SS.OPTIMAL)


def test_solve_dual_sparse_guards():
    """solve_dual accepts sparse A (tests/test_sparse_general.py proves the
    warm path); the unsupported knob combinations reject clearly."""
    from simplex_tpu.core.dual import solve_dual

    A, b, c = _sparse_canonical(8, 20, density=0.3, seed=28)
    M = bsp.from_dense(A, block_shape=(8, 8))
    with pytest.raises(NotImplementedError, match="backend"):
        solve_dual(M, b, c, options=SimplexOptions(backend="pallas"))


def test_solve_dual_sparse_devex_warm():
    """Sparse dual warm restart with devex cleanup pricing (the phase
    switch recomputes e via the tile rmatvec inside refactorize)."""
    from simplex_tpu.core.dual import solve_dual

    A, b, c = _sparse_canonical(12, 30, density=0.3, seed=33)
    M = bsp.from_dense(A, block_shape=(8, 8))
    opts = SimplexOptions(pricing="devex")
    cold = solve(M, b, c, options=opts)
    assert cold.status == SolveStatus.OPTIMAL
    b2 = (np.asarray(b, np.float64) * 1.06).astype(np.float32)
    warm = solve_dual(M, b2, c, basis0=cold.basis, options=opts)
    cold2 = solve(A, b2, c)
    assert warm.status == cold2.status == SolveStatus.OPTIMAL
    assert relative_gap(warm.z, cold2.z) < 1e-5
