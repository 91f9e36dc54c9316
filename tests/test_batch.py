"""Batched (vmap) solve tests, including batch-axis sharding over the faked
8-device CPU mesh (BASELINE.json configs[3])."""

import numpy as np
import pytest

from simplex_tpu.batch.vmapped import solve_batched
from simplex_tpu.config import SimplexOptions
from simplex_tpu.dist.mesh import BATCH_AXIS, make_mesh
from simplex_tpu.oracle.generator import random_dense_lp
from simplex_tpu.oracle.reference import relative_gap, solve_scipy
from simplex_tpu.status import SolveStatus


def stack_lps(B, m, n, dtype=np.float32):
    As, bs, cs = [], [], []
    for s in range(B):
        A, b, c = random_dense_lp(m, n, seed=100 + s, dtype=dtype)
        As.append(A)
        bs.append(b)
        cs.append(c)
    return np.stack(As), np.stack(bs), np.stack(cs)


def test_batched_matches_oracle():
    B, m, n = 8, 12, 30
    As, bs, cs = stack_lps(B, m, n)
    res = solve_batched(As, bs, cs)
    assert res.z.shape == (B,)
    for i in range(B):
        assert res.status[i] == SolveStatus.OPTIMAL
        ref = solve_scipy(As[i], bs[i], cs[i])
        assert relative_gap(float(res.z[i]), ref.z) < 1e-5
    # divergent pivot counts must not corrupt each other
    assert len(set(res.iters.tolist())) > 1


def test_batched_mixed_statuses():
    # one unbounded instance inside an otherwise-optimal batch
    B, m, n = 4, 2, 5
    As, bs, cs = stack_lps(B, m, n)
    As[2] = np.array([[-1, -1, 0, 1, 0], [-2, -1, 0, 0, 1]], np.float32)
    cs[2] = np.array([1, 0, 0, 0, 0], np.float32)
    res = solve_batched(As, bs, cs)
    assert res.status[2] == SolveStatus.UNBOUNDED
    for i in (0, 1, 3):
        assert res.status[i] == SolveStatus.OPTIMAL
        ref = solve_scipy(As[i], bs[i], cs[i])
        assert relative_gap(float(res.z[i]), ref.z) < 1e-5


def test_batched_sharded_over_mesh():
    import jax

    assert len(jax.devices()) == 8, "conftest must fake 8 CPU devices"
    mesh = make_mesh(axis_names=(BATCH_AXIS,))
    B, m, n = 16, 8, 20
    As, bs, cs = stack_lps(B, m, n)
    res = solve_batched(As, bs, cs, mesh=mesh)
    res_ref = solve_batched(As, bs, cs)
    np.testing.assert_allclose(res.z, res_ref.z, rtol=1e-6)
    np.testing.assert_array_equal(res.status, res_ref.status)


def test_batched_refactor_path():
    B, m, n = 4, 16, 40
    As, bs, cs = stack_lps(B, m, n)
    res = solve_batched(As, bs, cs, options=SimplexOptions(refactor_every=8))
    for i in range(B):
        assert res.status[i] == SolveStatus.OPTIMAL
        ref = solve_scipy(As[i], bs[i], cs[i])
        assert relative_gap(float(res.z[i]), ref.z) < 1e-5


def test_batched_native_bounds():
    """Shared box bounds across the batch (the scenario pattern): every
    instance must match its own single-LP bounded solve."""
    import numpy as np

    from simplex_tpu import SimplexOptions, SolveStatus, solve
    from simplex_tpu.batch.vmapped import solve_batched

    rng = np.random.default_rng(23)
    B, m, k = 4, 6, 14
    u = np.concatenate(
        [rng.uniform(0.3, 1.0, k), np.full(m, np.inf)]
    ).astype(np.float32)
    As, bs, cs = [], [], []
    for i in range(B):
        A0 = rng.uniform(0.2, 1.5, (m, k))
        As.append(np.hstack([A0, np.eye(m)]).astype(np.float32))
        bs.append(
            (A0 @ rng.uniform(0.2, 0.8, k) + rng.uniform(0.1, 1.0, m)).astype(
                np.float32
            )
        )
        cs.append(
            np.concatenate([rng.uniform(0.5, 2, k), np.zeros(m)]).astype(
                np.float32
            )
        )
    As, bs, cs = np.stack(As), np.stack(bs), np.stack(cs)
    res = solve_batched(As, bs, cs, u=u)
    for i in range(B):
        single = solve(As[i], bs[i], cs[i], u=u)
        assert SolveStatus(int(res.status[i])) == single.status, i
        assert abs(float(res.z[i]) - single.z) < 1e-3 * (1 + abs(single.z)), i
