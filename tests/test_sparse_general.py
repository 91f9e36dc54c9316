"""Sparse general pipeline: MPS -> scipy.sparse -> two-phase -> BlockSparse.

Round-3 follow-through on the fully sparse core: `read_mps(sparse=True)`
never builds dense A, `solve_general` standardizes in csc (column
transforms, row flips, slack/artificial blocks), and the device solve runs
on tiles — so the answer must be IDENTICAL (same status, objective, duals)
to the dense route on every fixture, including the tricky bound vocabulary
(shift/reflect/split/fixed), RANGES row expansion, and infeasible exits.
"""

import os

import numpy as np
import pytest
import scipy.sparse as sps

from simplex_tpu.core.twophase import GeneralLP, solve_general
from simplex_tpu.io.mps import read_mps
from simplex_tpu.oracle.reference import relative_gap, solve_scipy_general
from simplex_tpu.status import SolveStatus

DATA = os.path.join(os.path.dirname(__file__), "data")
FIXTURES = [
    "transport2x3.mps",
    "multiperiod16x8.mps",
    "prod_bounded.mps",
    "blend_ranges.mps",
    "freevar_mi.mps",
]


@pytest.mark.parametrize("fname", FIXTURES)
def test_read_mps_sparse_equals_dense(fname):
    d = read_mps(os.path.join(DATA, fname))
    s = read_mps(os.path.join(DATA, fname), sparse=True)
    assert sps.issparse(s.A)
    np.testing.assert_allclose(np.asarray(s.A.todense()), d.A, atol=0)
    np.testing.assert_allclose(s.b, d.b, atol=0)
    np.testing.assert_allclose(s.c, d.c, atol=0)
    np.testing.assert_allclose(s.lower, d.lower, atol=0)
    np.testing.assert_allclose(s.upper, d.upper, atol=0)
    assert s.row_types == d.row_types and s.col_names == d.col_names
    assert s.c0 == d.c0


def _general_pair(prob):
    """(dense GeneralLP, sparse GeneralLP) for one MPSProblem-like fixture."""
    c = prob.c if prob.maximize else -prob.c
    mk = lambda A: GeneralLP(
        A=A, b=prob.b, c=c, row_types=prob.row_types,
        lower=prob.lower, upper=prob.upper,
    )
    A_d = prob.A if not sps.issparse(prob.A) else np.asarray(prob.A.todense())
    return mk(A_d), mk(sps.csc_matrix(A_d))


@pytest.mark.parametrize("fname", FIXTURES)
def test_solve_general_sparse_matches_dense(fname):
    prob = read_mps(os.path.join(DATA, fname), sparse=True)
    lp_d, lp_s = _general_pair(prob)
    rd = solve_general(lp_d)
    rs = solve_general(lp_s)
    assert rs.status == rd.status
    if rd.status == SolveStatus.OPTIMAL:
        assert relative_gap(rs.z, rd.z) < 1e-6, (rs.z, rd.z)
        np.testing.assert_allclose(rs.y, rd.y, rtol=1e-4, atol=1e-6)
        ref = solve_scipy_general(lp_d)
        assert relative_gap(rs.z, ref.z) < 1e-5


def test_sparse_general_structured_instance():
    """A netlib-class structured instance (transportation) routed sparse,
    at a size where the sparsity is real (tile density < 1)."""
    from simplex_tpu.oracle.generator import transportation_lp

    lp = transportation_lp(16, 12, seed=3, balanced=False)
    lp_s = lp._replace(A=sps.csc_matrix(np.asarray(lp.A)))
    ref = solve_scipy_general(lp)
    rs = solve_general(lp_s)
    assert rs.status == SolveStatus.OPTIMAL
    assert relative_gap(rs.z, ref.z) < 1e-5


def test_sparse_general_infeasible():
    A = sps.csc_matrix(np.array([[1.0, 1.0], [1.0, 1.0]]))
    lp = GeneralLP(
        A=A, b=np.array([1.0, 3.0]), c=np.array([1.0, 1.0]),
        row_types=["E", "E"],
    )
    assert solve_general(lp).status == SolveStatus.INFEASIBLE


def test_cli_sparse_matches_dense():
    """`solve --sparse` on a bounded MPS returns the dense route's optimum."""
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    def run(*extra):
        return subprocess.run(
            [
                sys.executable, "-m", "simplex_tpu.cli", "solve",
                os.path.join(DATA, "prod_bounded.mps"), "--cpu", *extra,
            ],
            capture_output=True, text=True, cwd=repo, timeout=600,
        )

    rs, rd = run("--sparse"), run()
    assert rs.returncode == rd.returncode == 0, rs.stderr
    line = next(l for l in rd.stdout.splitlines() if "Optimum" in l)
    assert line in rs.stdout
    # --sparse without an MPS input is a clear error, not a crash
    bad = subprocess.run(
        [
            sys.executable, "-m", "simplex_tpu.cli", "solve",
            os.path.join(DATA, "sample.txt"), "--cpu", "--sparse",
        ],
        capture_output=True, text=True, cwd=repo, timeout=600,
    )
    assert bad.returncode == 1 and "MPS" in bad.stderr


def test_crossover_sparse_instance():
    """crossover() on a scipy A: dense QR for basis identification only,
    then the sparse-core cleanup — vertex-exact answer at oracle parity."""
    from simplex_tpu.fo.crossover import crossover
    from simplex_tpu.fo.pdhg import solve_pdhg
    from simplex_tpu.io.canonical import to_equality_form

    prob = read_mps(os.path.join(DATA, "multiperiod16x8.mps"), sparse=True)
    _, lp_s = _general_pair(prob)
    eq = to_equality_form(lp_s)
    assert sps.issparse(eq.A)
    A32 = eq.A.astype(np.float32)
    fo = solve_pdhg(A32, eq.b.astype(np.float32), eq.c.astype(np.float32),
                    u=eq.u.astype(np.float32), tol=1e-4)
    assert fo.status == SolveStatus.OPTIMAL
    vert = crossover(A32, eq.b.astype(np.float32), eq.c.astype(np.float32),
                     fo, u=eq.u.astype(np.float32))
    assert vert.status == SolveStatus.OPTIMAL
    ref = solve_scipy_general(_general_pair(prob)[0])
    assert relative_gap(vert.z + eq.z_const, ref.z) < 1e-5
    assert vert.feas_err < 1e-4


def test_sparse_general_warm_restart():
    """RHS warm re-solves run fully sparse too: the dual loop's btran row
    is a tile rmatvec. Same answer as the dense warm route and a cold
    sparse re-solve."""
    prob = read_mps(os.path.join(DATA, "multiperiod16x8.mps"), sparse=True)
    lp_d, lp_s = _general_pair(prob)
    rs = solve_general(lp_s)
    assert rs.status == SolveStatus.OPTIMAL and rs.warm is not None
    b2 = np.asarray(prob.b, np.float64) * 1.04
    lp_d2, lp_s2 = lp_d._replace(b=b2), lp_s._replace(b=b2)
    warm_s = solve_general(lp_s2, warm=rs.warm)
    cold_d = solve_general(lp_d2)
    assert warm_s.status == cold_d.status == SolveStatus.OPTIMAL
    assert relative_gap(warm_s.z, cold_d.z) < 1e-5
    ref = solve_scipy_general(lp_d2)
    assert relative_gap(warm_s.z, ref.z) < 1e-5


@pytest.mark.parametrize("pricing", ["dantzig", "devex"])
def test_solve_sharded_sparse(pricing):
    """Distributed SPARSE simplex: each shard holds only its columns'
    stored tiles; the collective structure (allreduce-argmin, owner-psum
    gathers) is identical to the dense mode, so the answers must match the
    dense sharded solve and the oracle."""
    import jax

    from simplex_tpu import SimplexOptions
    from simplex_tpu.dist.mesh import make_mesh
    from simplex_tpu.dist.sharded import solve_sharded
    from simplex_tpu.oracle.reference import solve_scipy

    from tests.test_sparse import _sparse_canonical
    from simplex_tpu import sparse as bsp

    A, b, c = _sparse_canonical(16, 48, density=0.3, seed=41)
    A = np.ascontiguousarray(A[:, :64]) if A.shape[1] != 64 else A
    mesh = make_mesh(devices=jax.devices()[:8])
    opts = SimplexOptions(pricing=pricing)
    ref = solve_scipy(A, b, c)
    dense = solve_sharded(A, b, c, mesh, options=opts)
    M = bsp.from_dense(A, block_shape=(8, 8))
    res = solve_sharded(M, b, c, mesh, options=opts)
    assert dense.status == res.status == SolveStatus.OPTIMAL
    assert relative_gap(res.z, ref.z) < 1e-5
    assert relative_gap(res.z, dense.z) < 1e-6
    assert res.feas_err < 1e-5
    # scipy input routes the same way (and feeds the host polish)
    res2 = solve_sharded(sps.csr_matrix(A), b, c, mesh, options=opts)
    assert res2.status == SolveStatus.OPTIMAL
    assert relative_gap(res2.z, ref.z) < 1e-5


def test_trace_sparse():
    """Per-pivot trace mode accepts sparse A and reaches the same optimum
    as the dense trace."""
    from simplex_tpu.core.trace import trace_pivots

    from tests.test_sparse import _sparse_canonical

    A, b, c = _sparse_canonical(10, 24, density=0.3, seed=61)
    # a dropped-to-zero column with positive cost makes the LP genuinely
    # unbounded; profit only supported columns
    c = c * (A != 0).any(axis=0)
    recs_d = list(trace_pivots(A, b, c))
    recs_s = list(trace_pivots(sps.csr_matrix(A), b, c))
    assert recs_d[-1].status == recs_s[-1].status == SolveStatus.OPTIMAL
    assert abs(recs_d[-1].objective - recs_s[-1].objective) < 1e-4
    # segmented pricing cannot run on tiles; the trace must say so rather
    # than silently tracing a different path
    from simplex_tpu import SimplexOptions

    with pytest.raises(NotImplementedError, match="partial_pricing"):
        next(
            iter(
                trace_pivots(
                    sps.csr_matrix(A), b, c,
                    options=SimplexOptions(
                        partial_pricing=4, partial_min_segment=1
                    ),
                )
            )
        )


def test_sparse_general_netlib_scale():
    """A 512-row bounded multi-period instance through the SPARSE general
    pipeline (csc standardization + tiled two-phase solve) at 1e-5 parity —
    the netlib-class scale gate, sparse edition."""
    from simplex_tpu.oracle.generator import multiperiod_production_lp

    lp = multiperiod_production_lp(32, 15, seed=0)
    m, k = lp.A.shape
    assert m == 512
    lp_s = lp._replace(A=sps.csc_matrix(np.asarray(lp.A)))
    rs = solve_general(lp_s)
    assert rs.status == SolveStatus.OPTIMAL
    ref = solve_scipy_general(lp)
    assert relative_gap(rs.z, ref.z) < 1e-5


def test_reoptimize_batched_sparse():
    """Batched scenario serving against ONE shared BlockSparse A: the
    vmapped warm loop reads tiles; per-scenario answers match the dense
    batched path."""
    from simplex_tpu import solve
    from simplex_tpu.batch.vmapped import reoptimize_batched

    from tests.test_sparse import _sparse_canonical

    A, b, c = _sparse_canonical(12, 30, density=0.3, seed=71)
    prev = solve(A, b, c)
    assert prev.status == SolveStatus.OPTIMAL
    rng = np.random.default_rng(72)
    B = 6
    bs_new = np.stack(
        [b * rng.uniform(0.9, 1.1, size=b.shape) for _ in range(B)]
    ).astype(np.float32)
    dense = reoptimize_batched(A, bs_new, c, prev)
    spr = reoptimize_batched(sps.csr_matrix(A), bs_new, c, prev)
    for i in range(B):
        assert int(spr.status[i]) == int(dense.status[i])
        if SolveStatus(int(dense.status[i])) == SolveStatus.OPTIMAL:
            assert relative_gap(float(spr.z[i]), float(dense.z[i])) < 1e-4
    assert spr.feas_err is not None and float(spr.feas_err.max()) < 1e-4


def test_review_regressions(tmp_path):
    """Round-3 self-review fixes stay fixed."""
    import subprocess
    import sys

    import jax.numpy as jnp

    from simplex_tpu import SimplexOptions, solve
    from simplex_tpu.batch.vmapped import reoptimize_batched
    from simplex_tpu.core.checkpoint import load_checkpoint, save_checkpoint
    from simplex_tpu.core.solver import _solve_jit
    from simplex_tpu.core.trace import trace_pivots

    from tests.test_sparse import _sparse_canonical

    A, b, c = _sparse_canonical(10, 24, density=0.35, seed=81)
    c = c * (A != 0).any(axis=0)
    A_sp = sps.csr_matrix(A)

    # (1) light DEVEX checkpoint resume with scipy A (the e-recompute
    # branch used to np.asarray a scipy matrix and crash)
    opts = SimplexOptions(max_iter=0, checkpoint_every=0, pricing="devex")
    st = _solve_jit(
        jnp.asarray(A), jnp.asarray(b), jnp.asarray(c),
        jnp.arange(14, 24, dtype=jnp.int32), opts, jnp.int32(4), True,
        None, None, None,
    )
    ck = tmp_path / "devex_light.npz"
    save_checkpoint(ck, st, light=True)
    loaded = load_checkpoint(ck, A=A_sp, b=b, c=c)
    e64 = np.asarray(loaded.y, np.float64) @ A.astype(np.float64) - c
    np.testing.assert_allclose(np.asarray(loaded.e), e64, atol=1e-5)

    # (2) f64 traces of scipy input honor options.dtype (no f32 tiles)
    o64 = SimplexOptions(dtype=jnp.float64)
    last_d = list(trace_pivots(A.astype(np.float64), b, c, options=o64))[-1]
    last_s = list(trace_pivots(A_sp.astype(np.float64), b, c, options=o64))[-1]
    assert abs(last_d.objective - last_s.objective) < 1e-9

    # (3) sparse + pallas rejects clearly everywhere, not deep inside jit
    prev = solve(A, b, c)
    with pytest.raises(NotImplementedError, match="xla"):
        reoptimize_batched(
            A_sp, b[None, :], c, prev,
            options=SimplexOptions(backend="pallas"),
        )
    with pytest.raises(NotImplementedError, match="xla"):
        next(iter(trace_pivots(
            A_sp, b, c, options=SimplexOptions(backend="pallas")
        )))

    # (4) analyze --sparse on a non-MPS input errors like solve does
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r = subprocess.run(
        [
            sys.executable, "-m", "simplex_tpu.cli", "analyze",
            os.path.join(DATA, "sample.txt"), "--cpu", "--sparse",
        ],
        capture_output=True, text=True, cwd=repo, timeout=600,
    )
    assert r.returncode == 1 and "MPS" in r.stderr


def test_checkpointed_sparse_solve(tmp_path):
    """solve_with_checkpoints on scipy A: chunked sparse solves, snapshot +
    resume, polish via host basis-column gathers — same optimum as direct."""
    from simplex_tpu import SimplexOptions, solve
    from simplex_tpu.core.checkpoint import solve_with_checkpoints

    from tests.test_sparse import _sparse_canonical

    A, b, c = _sparse_canonical(24, 60, density=0.25, seed=51)
    A_sp = sps.csr_matrix(A)
    direct = solve(A, b, c)
    ckpt = tmp_path / "state.npz"
    partial = solve_with_checkpoints(
        A_sp, b, c, path=ckpt,
        options=SimplexOptions(checkpoint_every=4, max_iter=4),
    )
    assert partial.status == SolveStatus.MAX_ITER
    res = solve_with_checkpoints(
        A_sp, b, c, path=ckpt, options=SimplexOptions(checkpoint_every=64)
    )
    assert res.status == SolveStatus.OPTIMAL
    assert relative_gap(res.z, direct.z) < 1e-5
    assert res.iters >= partial.iters


def test_light_checkpoint_sparse_roundtrip(tmp_path):
    """Light snapshots (basis + O(m) vectors) rebuild the inverse from
    SPARSE basis columns on resume."""
    import jax.numpy as jnp

    from simplex_tpu import SimplexOptions, solve
    from simplex_tpu import sparse as bsp
    from simplex_tpu.core.checkpoint import (
        load_checkpoint,
        save_checkpoint,
        validate_checkpoint,
    )
    from simplex_tpu.core.solver import _solve_jit

    from tests.test_sparse import _sparse_canonical

    A, b, c = _sparse_canonical(12, 30, density=0.3, seed=52)
    M = bsp.from_dense(A, block_shape=(8, 8))
    opts = SimplexOptions(max_iter=0, checkpoint_every=0)
    state = _solve_jit(
        M.astype(jnp.float32), jnp.asarray(b), jnp.asarray(c),
        jnp.arange(18, 30, dtype=jnp.int32), opts, jnp.int32(6), True,
        None, None, None,
    )
    ckpt = tmp_path / "light.npz"
    save_checkpoint(ckpt, state, light=True)
    loaded = load_checkpoint(ckpt, A=M, b=b, c=c)
    validate_checkpoint(loaded, M, b)
    np.testing.assert_array_equal(
        np.asarray(loaded.basis), np.asarray(state.basis)
    )
    # rebuilt inverse is exact for the snapshot basis
    AB = A[:, np.asarray(state.basis)]
    np.testing.assert_allclose(
        np.asarray(loaded.B_inv) @ AB, np.eye(12), atol=1e-4
    )


def test_ranging_sparse_matches_dense():
    """Sensitivity ranges on sparse A (chunked tableau streaming) equal the
    dense ranges bit-for-tolerance."""
    from simplex_tpu import solve
    from simplex_tpu.analysis import ranging

    from tests.test_sparse import _sparse_canonical

    A, b, c = _sparse_canonical(12, 30, density=0.3, seed=53)
    res = solve(A, b, c)
    assert res.status == SolveStatus.OPTIMAL
    rd = ranging(A, b, c, res.basis)
    rs = ranging(sps.csc_matrix(A), b, c, res.basis)
    assert rd.ok and rs.ok
    for fd, fs in zip(rd[:6], rs[:6]):
        np.testing.assert_allclose(fs, fd, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("pricing", ["dantzig", "devex"])
def test_solve_sharded_2d_sparse(pricing):
    """2-D (rows x cols) mesh mode over tiles: each cell holds only its
    columns' stored tiles; the row-sharded inverse, collectives, and
    distributed Newton-Schulz are unchanged — answers match the dense 2-D
    solve and the oracle. The LAST formerly dense-only surface."""
    import jax

    from simplex_tpu import SimplexOptions
    from simplex_tpu import sparse as bsp
    from simplex_tpu.dist.mesh import make_mesh
    from simplex_tpu.dist.sharded2d import solve_sharded_2d
    from simplex_tpu.oracle.reference import solve_scipy

    from tests.test_sparse import _sparse_canonical

    A, b, c = _sparse_canonical(16, 48, density=0.3, seed=91)
    c = c * (A != 0).any(axis=0)
    mesh = make_mesh(("rows", "cols"), shape=(2, 4))
    opts = SimplexOptions(pricing=pricing, refactor_every=32)
    ref = solve_scipy(A, b, c)
    assert ref.status == SolveStatus.OPTIMAL
    dense = solve_sharded_2d(A, b, c, mesh, options=opts)
    M = bsp.from_dense(A, block_shape=(8, 8))
    res = solve_sharded_2d(M, b, c, mesh, options=opts)
    assert dense.status == res.status == SolveStatus.OPTIMAL
    assert relative_gap(res.z, ref.z) < 1e-5
    assert relative_gap(res.z, dense.z) < 1e-6
    assert res.feas_err < 1e-5
    # scipy input converts + feeds the host polish
    res2 = solve_sharded_2d(sps.csr_matrix(A), b, c, mesh, options=opts)
    assert res2.status == SolveStatus.OPTIMAL
    assert relative_gap(res2.z, ref.z) < 1e-5


def test_checkpoint2d_sparse(tmp_path):
    """2-D chunked solve + light-snapshot resume over tiles."""
    from simplex_tpu import SimplexOptions
    from simplex_tpu.dist.checkpoint2d import solve_sharded_2d_with_checkpoints
    from simplex_tpu.dist.mesh import make_mesh
    from simplex_tpu.oracle.reference import solve_scipy

    from tests.test_sparse import _sparse_canonical

    A, b, c = _sparse_canonical(16, 48, density=0.3, seed=92)
    c = c * (A != 0).any(axis=0)
    A_sp = sps.csr_matrix(A)
    mesh = make_mesh(("rows", "cols"), shape=(2, 4))
    ref = solve_scipy(A, b, c)
    ck = tmp_path / "c2d.npz"
    partial = solve_sharded_2d_with_checkpoints(
        A_sp, b, c, mesh, path=ck,
        options=SimplexOptions(checkpoint_every=3, max_iter=3),
    )
    assert partial.status == SolveStatus.MAX_ITER
    res = solve_sharded_2d_with_checkpoints(
        A_sp, b, c, mesh, path=ck,
        options=SimplexOptions(checkpoint_every=64),
    )
    assert res.status == SolveStatus.OPTIMAL
    assert relative_gap(res.z, ref.z) < 1e-5
    assert res.iters >= partial.iters


def test_solve_dual_sparse_direct():
    """solve_dual takes scipy A directly: perturbed-RHS re-solve from the
    optimal basis matches the cold sparse solve."""
    from simplex_tpu import solve
    from simplex_tpu.core.dual import solve_dual

    from tests.test_sparse import _sparse_canonical

    A, b, c = _sparse_canonical(16, 40, density=0.25, seed=31)
    A_sp = sps.csr_matrix(A)
    cold = solve(A_sp, b, c)
    assert cold.status == SolveStatus.OPTIMAL
    b2 = (np.asarray(b, np.float64) * 1.05).astype(np.float32)
    warm = solve_dual(A_sp, b2, c, basis0=cold.basis)
    cold2 = solve(A, b2, c)
    assert warm.status == cold2.status == SolveStatus.OPTIMAL
    assert relative_gap(warm.z, cold2.z) < 1e-5
    assert warm.feas_err < 1e-5
