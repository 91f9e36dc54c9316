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
    with pytest.raises(NotImplementedError, match="devex"):
        solve(M, b, c, options=SimplexOptions(pricing="devex"))
    with pytest.raises(NotImplementedError, match="segmented|partial"):
        solve(
            M, b, c,
            options=SimplexOptions(partial_pricing=4, partial_min_segment=1),
        )


def test_solve_dual_sparse_guards():
    """solve_dual accepts sparse A (tests/test_sparse_general.py proves the
    warm path); the unsupported knob combinations reject clearly."""
    from simplex_tpu.core.dual import solve_dual

    A, b, c = _sparse_canonical(8, 20, density=0.3, seed=28)
    M = bsp.from_dense(A, block_shape=(8, 8))
    with pytest.raises(NotImplementedError, match="backend"):
        solve_dual(M, b, c, options=SimplexOptions(backend="pallas"))
    with pytest.raises(NotImplementedError, match="devex"):
        solve_dual(M, b, c, options=SimplexOptions(pricing="devex"))
