"""2-D (rows x cols) sharded solver: oracle parity on a faked CPU mesh.

Row-shards B_inv/x_b/basis over "rows" and columns of A over the whole mesh
(SURVEY.md §7 step 5's 'row-shard B_inv' extension). conftest fakes 8 CPU
devices, so 2x4 / 4x2 / 2x2 meshes run real collectives.
"""

import jax
import numpy as np
import pytest

from simplex_tpu import SimplexOptions, SolveStatus
from simplex_tpu.dist.mesh import make_mesh
from simplex_tpu.dist.sharded2d import COLS_AXIS, ROWS_AXIS, solve_sharded_2d
from simplex_tpu.oracle.generator import random_dense_lp
from simplex_tpu.oracle.reference import relative_gap, solve_scipy


def mesh_2d(R, C):
    return make_mesh(
        axis_names=(ROWS_AXIS, COLS_AXIS),
        shape=(R, C),
        devices=jax.devices()[: R * C],
    )


@pytest.mark.parametrize("R,C", [(2, 4), (4, 2), (2, 2), (1, 4)])
def test_2d_matches_oracle(R, C):
    m, n = 8 * R, 16 * R * C
    A, b, c = random_dense_lp(m, n, seed=3, dtype=np.float32)
    ref = solve_scipy(A, b, c)
    res = solve_sharded_2d(A, b, c, mesh_2d(R, C))
    assert res.status == ref.status == SolveStatus.OPTIMAL
    assert relative_gap(res.z, ref.z) < 1e-5
    np.testing.assert_allclose(A @ res.x, b, atol=1e-3)


def test_2d_matches_1d_and_single():
    from simplex_tpu.core.solver import solve
    from simplex_tpu.dist.sharded import solve_sharded

    m, n = 16, 64
    A, b, c = random_dense_lp(m, n, seed=5, dtype=np.float32)
    single = solve(A, b, c)
    one_d = solve_sharded(
        A, b, c, make_mesh(devices=jax.devices()[:4])
    )
    two_d = solve_sharded_2d(A, b, c, mesh_2d(2, 2))
    assert single.status == one_d.status == two_d.status == SolveStatus.OPTIMAL
    assert two_d.z == pytest.approx(single.z, rel=1e-5)
    assert one_d.z == pytest.approx(single.z, rel=1e-5)


def test_2d_bf16_pricing():
    m, n = 16, 32
    A, b, c = random_dense_lp(m, n, seed=7, dtype=np.float32)
    ref = solve_scipy(A, b, c)
    res = solve_sharded_2d(
        A, b, c, mesh_2d(2, 2),
        options=SimplexOptions(pricing_dtype="bfloat16"),
    )
    assert res.status == SolveStatus.OPTIMAL
    assert relative_gap(res.z, ref.z) < 1e-5


def test_2d_unbounded():
    # max x0 with one <=-row whose slack can grow: unbounded detected globally
    m, n = 2, 8
    A = np.zeros((m, n), np.float32)
    A[0, 0] = -1.0
    A[1, 1] = 1.0
    A[:, n - m:] = np.eye(m, dtype=np.float32)
    b = np.array([1.0, 2.0], np.float32)
    c = np.zeros(n, np.float32)
    c[0] = 1.0
    res = solve_sharded_2d(A, b, c, mesh_2d(2, 2))
    assert res.status == SolveStatus.UNBOUNDED


def test_2d_shape_validation():
    A, b, c = random_dense_lp(6, 24, seed=1, dtype=np.float32)
    with pytest.raises(ValueError, match="divide the mesh"):
        solve_sharded_2d(A, b, c, mesh_2d(4, 2))  # m=6 not divisible by R=4


def test_2d_with_refactorization():
    # distributed Newton refactorization fires in-loop and the solve still
    # reaches the oracle optimum
    m, n = 16, 64
    A, b, c = random_dense_lp(m, n, seed=9, dtype=np.float32)
    ref = solve_scipy(A, b, c)
    res = solve_sharded_2d(
        A, b, c, mesh_2d(2, 2),
        options=SimplexOptions(refactor_every=4, pricing_dtype="bfloat16"),
    )
    assert res.status == SolveStatus.OPTIMAL
    assert relative_gap(res.z, ref.z) < 1e-5


def test_2d_refactorization_rescues_corrupt_inverse():
    # f64 path with aggressive refactor interval: objective matches the
    # single-chip solver exactly (refactorization path is exercised and
    # exact on every interval)
    import jax.numpy as jnp

    from simplex_tpu.core.solver import solve

    m, n = 8, 32
    A, b, c = random_dense_lp(m, n, seed=14, dtype=np.float64)
    single = solve(A, b, c, options=SimplexOptions(dtype=jnp.float64))
    res = solve_sharded_2d(
        A, b, c, mesh_2d(2, 2),
        options=SimplexOptions(dtype=jnp.float64, refactor_every=2),
    )
    assert res.status == SolveStatus.OPTIMAL
    assert res.z == pytest.approx(single.z, rel=1e-9)


def test_2d_nonzero_slack_costs():
    # regression: the 2-D init must source each basis slot's cost from its
    # column OWNER (which can sit in a different rows-group) — a per-group
    # ownership mask psum mixed slot positions across groups and was only
    # invisible because random LPs use zero slack costs.
    rng = np.random.default_rng(0)
    m, n = 8, 32
    A = np.zeros((m, n), np.float32)
    A[:, : n - m] = rng.uniform(0.2, 1.0, (m, n - m)).astype(np.float32)
    A[:, n - m:] = np.eye(m, dtype=np.float32)
    b = rng.uniform(1.0, 2.0, m).astype(np.float32)
    c = rng.standard_normal(n).astype(np.float32)
    c[n - m:] = rng.uniform(-1.0, -0.1, m)  # NONZERO slack costs
    ref = solve_scipy(A, b, c)
    res = solve_sharded_2d(A, b, c, mesh_2d(2, 2))
    assert res.status == ref.status == SolveStatus.OPTIMAL
    assert relative_gap(res.z, ref.z) < 1e-5


@pytest.mark.parametrize("L", [4, 16])
def test_2d_update_defer(L):
    """Deferred rank-L updates in 2-D match the oracle (verdict item #2)."""
    m, n = 16, 64
    A, b, c = random_dense_lp(m, n, seed=11, dtype=np.float32)
    ref = solve_scipy(A, b, c)
    res = solve_sharded_2d(
        A, b, c, mesh_2d(2, 2),
        options=SimplexOptions(update_defer=L),
    )
    assert res.status == SolveStatus.OPTIMAL
    assert relative_gap(res.z, ref.z) < 1e-5


def test_2d_partial_pricing():
    """Segmented pricing over the local shard, small segment floor so the
    path actually activates at test size."""
    m, n = 16, 64
    A, b, c = random_dense_lp(m, n, seed=12, dtype=np.float32)
    ref = solve_scipy(A, b, c)
    res = solve_sharded_2d(
        A, b, c, mesh_2d(2, 2),
        options=SimplexOptions(partial_pricing=2, partial_min_segment=4),
    )
    assert res.status == SolveStatus.OPTIMAL
    assert relative_gap(res.z, ref.z) < 1e-5


def test_2d_devex():
    """Devex pricing in 2-D: incremental column-sharded reduced costs."""
    m, n = 16, 64
    A, b, c = random_dense_lp(m, n, seed=13, dtype=np.float32)
    ref = solve_scipy(A, b, c)
    res = solve_sharded_2d(
        A, b, c, mesh_2d(2, 2),
        options=SimplexOptions(pricing="devex"),
    )
    assert res.status == SolveStatus.OPTIMAL
    assert relative_gap(res.z, ref.z) < 1e-5


def test_2d_flagship_config():
    """The full flagship recipe (bf16 pricing + deferred updates + partial
    pricing + refactorization) now runs in the 2-D mode — the combination
    the 32k x 131k north-star config needs (BASELINE.json configs[4])."""
    m, n = 16, 64
    A, b, c = random_dense_lp(m, n, seed=15, dtype=np.float32)
    ref = solve_scipy(A, b, c)
    res = solve_sharded_2d(
        A, b, c, mesh_2d(2, 2),
        options=SimplexOptions(
            pricing_dtype="bfloat16",
            update_defer=8,
            partial_pricing=2,
            partial_min_segment=4,
            refactor_every=32,
        ),
    )
    assert res.status == SolveStatus.OPTIMAL
    assert relative_gap(res.z, ref.z) < 1e-5
    np.testing.assert_allclose(A @ res.x, b, atol=1e-3)


def test_2d_devex_with_defer_and_refactor():
    m, n = 16, 32
    A, b, c = random_dense_lp(m, n, seed=16, dtype=np.float32)
    ref = solve_scipy(A, b, c)
    res = solve_sharded_2d(
        A, b, c, mesh_2d(2, 2),
        options=SimplexOptions(
            pricing="devex", update_defer=4, refactor_every=16
        ),
    )
    assert res.status == SolveStatus.OPTIMAL
    assert relative_gap(res.z, ref.z) < 1e-5


@pytest.mark.parametrize("K", [2, 8])
def test_2d_multi_price_matches_oracle(K):
    """Multiple pricing in the 2-D mode (round-4 verdict #3): K-candidate
    buffer with exact local-shard refills, two tiled all-gathers merging the
    per-chip top-Ks, one (m, K) psum replicating the candidate columns, and
    pressure-only rank-L flushes (frozen base, like core/step.py). Minor
    pivots add ZERO collectives over the non-multi pivot."""
    m, n = 16, 64
    A, b, c = random_dense_lp(m, n, seed=21, dtype=np.float32)
    ref = solve_scipy(A, b, c)
    res = solve_sharded_2d(
        A, b, c, mesh_2d(2, 2),
        options=SimplexOptions(multi_price=K, refactor_every=32),
    )
    assert res.status == SolveStatus.OPTIMAL
    assert relative_gap(res.z, ref.z) < 1e-5
    np.testing.assert_allclose(A @ res.x, b, atol=1e-3)


def test_2d_multi_price_flagship_composition():
    """multi_price composed with the full 2-D flagship stack (bf16 shadow +
    deferred updates + refactorization) — the 32k north-star recipe."""
    m, n = 16, 64
    A, b, c = random_dense_lp(m, n, seed=22, dtype=np.float32)
    ref = solve_scipy(A, b, c)
    res = solve_sharded_2d(
        A, b, c, mesh_2d(2, 4),
        options=SimplexOptions(
            multi_price=8,
            pricing_dtype="bfloat16",
            update_defer=8,
            refactor_every=32,
        ),
    )
    assert res.status == SolveStatus.OPTIMAL
    assert relative_gap(res.z, ref.z) < 1e-5


def test_2d_multi_price_matches_plain_objective():
    """Same optimum as the non-multi 2-D solve on a degenerate-ish LP
    (every 4th rhs zero) — exercises the Bland refill path and the exact
    entry recheck under ties."""
    from simplex_tpu.oracle.generator import degenerate_streak_lp

    A, b, c = degenerate_streak_lp(16, 48, seed=7)
    ref = solve_scipy(A, b, c)
    res = solve_sharded_2d(
        A, b, c, mesh_2d(2, 2),
        options=SimplexOptions(
            multi_price=4, refactor_every=16, perturb_after=0
        ),
    )
    assert res.status == SolveStatus.OPTIMAL
    assert relative_gap(res.z, ref.z) < 1e-4
