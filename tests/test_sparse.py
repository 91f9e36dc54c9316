"""BlockSparse format + sparse PDHG tests (round-2 verdict missing #3).

The ops are pinned against dense references; the PDHG path is pinned
against both the dense PDHG solve and the scipy oracle so the sparse
storage provably changes only the traffic, never the answer.
"""

import numpy as np
import pytest

from simplex_tpu import sparse as bsp
from simplex_tpu.fo.pdhg import solve_pdhg
from simplex_tpu.oracle.generator import transportation_lp
from simplex_tpu.oracle.reference import relative_gap, solve_scipy
from simplex_tpu.status import SolveStatus


def _random_block_sparse(m, n, density, seed, block=(16, 16)):
    rng = np.random.default_rng(seed)
    A = rng.normal(size=(m, n))
    A[rng.uniform(size=(m, n)) > density] = 0.0
    return A.astype(np.float32), bsp.from_dense(A, block_shape=block)


def _transport_eq(ns, nd, seed):
    """Transportation LP in equality form (L rows +slack, G rows -surplus)
    + its scipy reference objective."""
    from simplex_tpu.oracle.reference import solve_scipy_general

    lp = transportation_lp(ns, nd, seed=seed, balanced=False)
    ref = solve_scipy_general(lp)
    m, _ = lp.A.shape
    cols = []
    for i, t in enumerate(lp.row_types):
        e = np.zeros(m)
        e[i] = 1.0 if t == "L" else -1.0
        cols.append(e)
    A_eq = np.concatenate([lp.A, np.stack(cols, axis=1)], axis=1).astype(
        np.float32
    )
    c_eq = np.concatenate([lp.c, np.zeros(m)]).astype(np.float32)
    return A_eq, lp.b.astype(np.float32), c_eq, ref


@pytest.mark.parametrize("m,n", [(30, 70), (128, 200), (16, 16)])
def test_roundtrip_and_matvec(m, n):
    A, M = _random_block_sparse(m, n, 0.05, seed=1)
    np.testing.assert_allclose(np.asarray(M.to_dense()), A, atol=0)
    x = np.random.default_rng(2).normal(size=n).astype(np.float32)
    y = np.random.default_rng(3).normal(size=m).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(bsp.matvec(M, x)), A @ x, rtol=1e-5, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(bsp.rmatvec(M, y)), y @ A, rtol=1e-5, atol=1e-5
    )


def test_absmax_and_scale():
    A, M = _random_block_sparse(40, 90, 0.1, seed=4)
    np.testing.assert_allclose(
        np.asarray(bsp.row_absmax(M)), np.abs(A).max(axis=1), rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(bsp.col_absmax(M)), np.abs(A).max(axis=0), rtol=1e-6
    )
    assert float(bsp.absmax(M)) == pytest.approx(float(np.abs(A).max()))
    r = np.random.default_rng(5).uniform(0.5, 2, 40).astype(np.float32)
    c = np.random.default_rng(6).uniform(0.5, 2, 90).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(bsp.scale(M, r, c).to_dense()),
        A * r[:, None] * c[None, :],
        rtol=1e-5,
    )


def test_from_scipy_matches_from_dense():
    scipy_sparse = pytest.importorskip("scipy.sparse")
    A, M1 = _random_block_sparse(50, 120, 0.03, seed=7)
    M2 = bsp.from_scipy(scipy_sparse.csr_matrix(A), block_shape=(16, 16))
    np.testing.assert_allclose(
        np.asarray(M2.to_dense()), np.asarray(M1.to_dense()), atol=0
    )
    assert M2.n_tiles == M1.n_tiles


def test_tile_density_reflects_sparsity():
    A = np.zeros((64, 64), np.float32)
    A[:16, :16] = 1.0  # exactly one 16x16 tile of the 4x4 grid
    M = bsp.from_dense(A, block_shape=(16, 16))
    assert M.n_tiles == 1
    assert M.tile_density() == pytest.approx(1 / 16)


def test_all_zero_matrix_stays_well_posed():
    M = bsp.from_dense(np.zeros((10, 20), np.float32), block_shape=(16, 16))
    assert M.n_tiles == 1  # sentinel zero tile
    assert np.all(np.asarray(bsp.matvec(M, np.ones(20, np.float32))) == 0)
    assert np.all(np.asarray(bsp.row_absmax(M)) == 0)


def test_pdhg_sparse_matches_dense_and_oracle():
    # transportation LPs are 0/1-sparse and PDHG-benign (module docstring)
    A, b, c, ref = _transport_eq(10, 12, seed=3)
    assert ref.status == SolveStatus.OPTIMAL
    dense = solve_pdhg(A, b, c, tol=1e-5)
    M = bsp.from_dense(A, block_shape=(8, 8))
    assert M.tile_density() < 1.0
    sp = solve_pdhg(M, b, c, tol=1e-5)
    assert dense.status == sp.status == SolveStatus.OPTIMAL
    assert relative_gap(sp.z, ref.z) < 1e-3
    assert relative_gap(sp.z, dense.z) < 1e-4


def test_pdhg_accepts_scipy_sparse():
    scipy_sparse = pytest.importorskip("scipy.sparse")
    A, b, c, ref = _transport_eq(4, 5, seed=1)
    res = solve_pdhg(scipy_sparse.csr_matrix(np.asarray(A)), b, c, tol=1e-5)
    assert res.status == SolveStatus.OPTIMAL
    assert relative_gap(res.z, ref.z) < 1e-3


def test_pdhg_sparse_infeasible_certificate():
    M = bsp.from_dense(np.array([[1.0, 1.0]], np.float32), block_shape=(8, 8))
    res = solve_pdhg(
        M, np.array([-1.0]), np.array([1.0, 1.0]), tol=1e-6, max_iter=100_000
    )
    assert res.status == SolveStatus.INFEASIBLE
    r = res.ray_dual
    assert r is not None and float(np.array([-1.0]) @ r) > 0


def test_pdhg_sparse_bounded_netlib_class():
    """The full netlib-class shape in one: a multiperiod production LP
    (mostly-sparse equality structure, bounds on EVERY structural column)
    in equality form, solved block-sparse with native box bounds, against
    HiGHS on the same general form."""
    from simplex_tpu.oracle.generator import multiperiod_production_lp
    from simplex_tpu.oracle.reference import solve_scipy_general

    lp = multiperiod_production_lp(6, 4, seed=2)  # 30 rows, 72 bounded cols
    ref = solve_scipy_general(lp)
    assert ref.status == SolveStatus.OPTIMAL
    m, k = lp.A.shape
    slack_cols = [i for i, t in enumerate(lp.row_types) if t == "L"]
    S = np.zeros((m, len(slack_cols)))
    for j, i in enumerate(slack_cols):
        S[i, j] = 1.0
    A_eq = np.concatenate([lp.A, S], axis=1).astype(np.float32)
    c_eq = np.concatenate([lp.c, np.zeros(len(slack_cols))]).astype(
        np.float32
    )
    u_eq = np.concatenate(
        [lp.upper, np.full(len(slack_cols), np.inf)]
    ).astype(np.float32)
    M = bsp.from_dense(A_eq, block_shape=(8, 8))
    assert M.tile_density() < 0.9
    res = solve_pdhg(
        M, lp.b.astype(np.float32), c_eq, u=u_eq, tol=1e-5, max_iter=600_000
    )
    assert res.status == SolveStatus.OPTIMAL, (res.status, res.iters)
    assert relative_gap(res.z, ref.z) < 1e-3


def _sparse_canonical(m, k, density, seed):
    """Sparse A0 + identity slacks, b > 0 (feasible slack basis)."""
    rng = np.random.default_rng(seed)
    A0 = rng.uniform(0.2, 1.5, (m, k))
    A0[rng.uniform(size=A0.shape) > density] = 0.0
    A = np.hstack([A0, np.eye(m)]).astype(np.float32)
    b = (A0 @ rng.uniform(0.2, 0.8, k) + rng.uniform(0.1, 1.0, m)).astype(
        np.float32
    )
    c = np.concatenate([rng.uniform(0.5, 2, k), np.zeros(m)]).astype(
        np.float32
    )
    return A, b, c


def test_simplex_pricing_sparse_matches_oracle():
    """pricing_sparse: the simplex core's O(mn) pricing pass runs over a
    BlockSparse shadow; answers must meet the same oracle bar (the winner
    is exactly re-verified, termination stays exact)."""
    from simplex_tpu import SimplexOptions, solve

    A, b, c = _sparse_canonical(24, 60, density=0.2, seed=6)
    ref = solve_scipy(A, b, c)
    assert ref.status == SolveStatus.OPTIMAL
    for pdtype in ("float32", "bfloat16"):
        res = solve(
            A, b, c,
            options=SimplexOptions(
                pricing_sparse=True, pricing_dtype=pdtype, refactor_every=64
            ),
        )
        assert res.status == SolveStatus.OPTIMAL, pdtype
        assert relative_gap(res.z, ref.z) < 1e-5, pdtype


def test_simplex_pricing_sparse_bounded():
    from simplex_tpu import SimplexOptions, solve

    rng = np.random.default_rng(8)
    m, k = 8, 20
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
    res = solve(A, b, c, u=u, options=SimplexOptions(pricing_sparse=True))
    assert res.status == base.status == SolveStatus.OPTIMAL
    assert relative_gap(res.z, base.z) < 1e-5


def test_simplex_pricing_sparse_rejects_segments():
    from simplex_tpu import SimplexOptions, solve

    A, b, c, _ = _transport_eq(4, 5, seed=1)
    with pytest.raises(NotImplementedError, match="partial_pricing"):
        solve(
            A, b, c,
            options=SimplexOptions(
                pricing_sparse=True, partial_pricing=4, partial_min_segment=1
            ),
        )


def test_pdhg_sharded_block_sparse():
    """Column-sharded sparse PDHG: tiles partitioned across the mesh,
    answers matching the single-chip sparse solve and the oracle."""
    import jax

    from simplex_tpu.dist.mesh import make_mesh
    from simplex_tpu.fo.sharded import solve_pdhg_sharded

    A, b, c, ref = _transport_eq(10, 12, seed=3)  # n = 142... check
    n = A.shape[1]
    # pad columns to a multiple of 8 shards x 8-wide tiles
    D = 8
    pad = (-n) % (D * 8)
    if pad:
        A = np.concatenate([A, np.zeros((A.shape[0], pad), A.dtype)], axis=1)
        c = np.concatenate([c, np.full(pad, -1.0, c.dtype)])
    M = bsp.from_dense(A, block_shape=(8, 8))
    mesh = make_mesh(devices=jax.devices()[:D])
    res = solve_pdhg_sharded(M, b, c, mesh, tol=1e-5)
    assert res.status == SolveStatus.OPTIMAL, (res.status, res.iters)
    assert relative_gap(res.z, ref.z) < 1e-3


def test_pdhg_sharded_sparse_bounded():
    import jax

    from simplex_tpu.dist.mesh import make_mesh
    from simplex_tpu.fo.sharded import solve_pdhg_sharded

    rng = np.random.default_rng(19)
    m, k = 8, 24
    A0 = rng.uniform(0.2, 1.5, (m, k))
    A0[rng.uniform(size=A0.shape) > 0.4] = 0.0
    A = np.hstack([A0, np.eye(m)]).astype(np.float32)  # n = 32
    b = (A0 @ rng.uniform(0.2, 0.8, k) + rng.uniform(0.1, 1.0, m)).astype(
        np.float32
    )
    c = np.concatenate([rng.uniform(0.5, 2, k), np.zeros(m)]).astype(
        np.float32
    )
    u = np.concatenate(
        [rng.uniform(0.3, 1.0, k), np.full(m, np.inf)]
    ).astype(np.float32)
    single = solve_pdhg(A, b, c, u=u, tol=1e-6, max_iter=400_000,
                        adaptive_weight=False)
    assert single.status == SolveStatus.OPTIMAL
    M = bsp.from_dense(A, block_shape=(4, 4))  # 32 cols / 8 shards = 4
    mesh = make_mesh(devices=jax.devices()[:8])
    res = solve_pdhg_sharded(M, b, c, mesh, u=u, tol=1e-6, max_iter=400_000)
    assert res.status == SolveStatus.OPTIMAL, (res.status, res.iters)
    assert relative_gap(res.z, single.z) < 1e-3
