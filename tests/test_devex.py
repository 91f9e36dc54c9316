"""Devex incremental pricing: same optima as Dantzig, (usually far) fewer
pivots, exact termination, works under vmap and shard_map."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from simplex_tpu import SimplexOptions, SolveStatus, solve
from simplex_tpu.oracle.generator import random_dense_lp
from simplex_tpu.oracle.reference import relative_gap, solve_scipy

DEVEX = SimplexOptions(pricing="devex")
DEVEX64 = SimplexOptions(pricing="devex", dtype=jnp.float64)


@pytest.mark.parametrize("m,n,seed", [(8, 20, 0), (32, 80, 1), (96, 240, 2)])
def test_devex_matches_oracle(m, n, seed):
    A, b, c = random_dense_lp(m, n, seed=seed, dtype=np.float64)
    ref = solve_scipy(A, b, c)
    res = solve(A, b, c, options=DEVEX64)
    assert res.status == SolveStatus.OPTIMAL
    assert relative_gap(res.z, ref.z) < 1e-9


def test_devex_fp32_with_refactor():
    A, b, c = random_dense_lp(128, 320, seed=3)
    ref = solve_scipy(A, b, c)
    res = solve(A, b, c, options=SimplexOptions(pricing="devex", refactor_every=64))
    assert res.status == SolveStatus.OPTIMAL
    assert relative_gap(res.z, ref.z) < 1e-4


def test_devex_fewer_or_equal_pivots_on_average():
    """Devex's whole point: fewer pivots than Dantzig on average."""
    total_dantzig = total_devex = 0
    for seed in range(6):
        A, b, c = random_dense_lp(48, 160, seed=40 + seed, dtype=np.float64)
        opt64 = SimplexOptions(dtype=jnp.float64)
        r_dan = solve(A, b, c, options=opt64)
        r_dev = solve(A, b, c, options=DEVEX64)
        assert r_dan.status == r_dev.status == SolveStatus.OPTIMAL
        assert relative_gap(r_dev.z, r_dan.z) < 1e-9
        total_dantzig += r_dan.iters
        total_devex += r_dev.iters
    assert total_devex <= total_dantzig * 1.05, (total_devex, total_dantzig)


def test_devex_unbounded():
    A = np.array([[-1.0, 1.0, 1.0]])
    b = np.array([1.0])
    c = np.array([1.0, 0.0, 0.0])
    res = solve(A, b, c, options=DEVEX)
    assert res.status == SolveStatus.UNBOUNDED


def test_devex_already_optimal():
    A = np.array([[1.0, 1.0, 0.0], [1.0, 0.0, 1.0]])
    b = np.array([1.0, 2.0])
    c = np.array([-1.0, 0.0, 0.0])
    res = solve(A, b, c, options=DEVEX)
    assert res.status == SolveStatus.OPTIMAL and res.iters == 0


def test_devex_batched():
    from simplex_tpu.batch.vmapped import solve_batched

    As, bs, cs = [], [], []
    for s in range(6):
        A, b, c = random_dense_lp(12, 30, seed=60 + s)
        As.append(A); bs.append(b); cs.append(c)
    res = solve_batched(np.stack(As), np.stack(bs), np.stack(cs), options=DEVEX)
    for i in range(6):
        assert res.status[i] == SolveStatus.OPTIMAL
        ref = solve_scipy(As[i], bs[i], cs[i])
        assert relative_gap(float(res.z[i]), ref.z) < 1e-5


def test_devex_sharded():
    from simplex_tpu.dist.mesh import COLS_AXIS, make_mesh
    from simplex_tpu.dist.sharded import solve_sharded

    assert len(jax.devices()) == 8
    mesh = make_mesh(axis_names=(COLS_AXIS,))
    A, b, c = random_dense_lp(32, 96, seed=70)
    ref = solve_scipy(A, b, c)
    res = solve_sharded(A, b, c, mesh, options=DEVEX)
    res_local = solve(A, b, c, options=DEVEX)
    assert res.status == SolveStatus.OPTIMAL
    assert relative_gap(res.z, ref.z) < 1e-5
    # same deterministic pivot path as the single-device devex solve
    assert res.iters == res_local.iters
    np.testing.assert_array_equal(res.basis, res_local.basis)
