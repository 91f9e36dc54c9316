"""Multiple pricing (suboptimization): correctness must be unchanged.

``SimplexOptions.multi_price=K`` amortizes the per-pivot m^2 fp32 read of the
base inverse (the measured per-pivot floor, docs/TUNING.md) over up to K
pivots: one pricing pass picks the K most-improving columns, ONE
(m, m) x (m, K) GEMM ftrans them all, and minor pivots update the buffered
tableau columns exactly by the product form. These tests pin the contract
that it changes only the pivot *path*: refills price everything, termination
is always decided by an exact full pass, so objectives still meet the oracle
parity gate (BASELINE.json: 1e-6 relative).
"""

import numpy as np
import pytest

from simplex_tpu import SimplexOptions, SolveStatus, solve
from simplex_tpu.oracle.generator import random_dense_lp
from simplex_tpu.oracle.reference import relative_gap, solve_scipy

SIZES = [(4, 10), (16, 40), (48, 120)]


@pytest.mark.parametrize("m,n", SIZES)
@pytest.mark.parametrize("K", [1, 4, 16])
def test_multi_price_matches_oracle(m, n, K):
    A, b, c = random_dense_lp(m, n, seed=7, dtype=np.float32)
    ref = solve_scipy(A, b, c)
    assert ref.status == SolveStatus.OPTIMAL
    res = solve(
        A, b, c,
        options=SimplexOptions(multi_price=K, refactor_every=64),
    )
    assert res.status == SolveStatus.OPTIMAL
    assert relative_gap(res.z, ref.z) < 1e-5
    np.testing.assert_allclose(A @ res.x, b, atol=1e-3)
    assert np.all(res.x >= -1e-4)


def test_multi_price_golden_sample():
    # the reference's golden LP: optimum 9 at x0=1, x1=3 (input/sample.txt:15-16)
    A = np.array([[2.0, 1, 1, 0], [1, 3, 0, 1]], np.float32)
    b = np.array([5.0, 10.0], np.float32)
    c = np.array([3.0, 2, 0, 0], np.float32)
    res = solve(A, b, c, options=SimplexOptions(multi_price=2))
    assert res.status == SolveStatus.OPTIMAL
    assert abs(res.z - 9.0) < 1e-5
    np.testing.assert_allclose(res.x[:2], [1.0, 3.0], atol=1e-5)


def test_multi_price_k_larger_than_n_clamps():
    # K > column count: the buffer clamps to n (top_k stays well-posed)
    A, b, c = random_dense_lp(4, 10, seed=9, dtype=np.float32)
    ref = solve_scipy(A, b, c)
    res = solve(A, b, c, options=SimplexOptions(multi_price=64))
    assert res.status == SolveStatus.OPTIMAL
    assert relative_gap(res.z, ref.z) < 1e-5


def test_multi_price_unbounded_detected():
    A = np.array([[1.0, -1.0, 1.0]], np.float32)
    b = np.array([1.0], np.float32)
    c = np.array([1.0, 1.0, 0.0], np.float32)
    res = solve(A, b, c, options=SimplexOptions(multi_price=2))
    assert res.status == SolveStatus.UNBOUNDED


def test_multi_price_degenerate_bland_terminates():
    # Bland's rule must see the LOWEST improving index, not the K most
    # negative: the refill collapses to a single exact first-eligible
    # candidate while the rule is active.
    A, b, c = random_dense_lp(24, 60, seed=11, dtype=np.float32, degenerate=True)
    ref = solve_scipy(A, b, c)
    res = solve(
        A, b, c,
        options=SimplexOptions(multi_price=8, bland_after=8, refactor_every=32),
    )
    assert res.status == SolveStatus.OPTIMAL
    assert relative_gap(res.z, ref.z) < 1e-4


def test_multi_price_beale_cycling_terminates():
    from simplex_tpu.oracle.generator import beale_cycling_lp

    A, b, c = beale_cycling_lp()
    res = solve(
        A, b, c, options=SimplexOptions(multi_price=4, bland_after=16)
    )
    assert res.status == SolveStatus.OPTIMAL
    assert abs(res.z - 0.05) < 1e-6


@pytest.mark.parametrize("pricing_dtype", ["float32", "bfloat16"])
def test_multi_price_with_shadow_and_defer(pricing_dtype):
    # flagship-style composition: bf16 shadow refill pass + rank-L deferred
    # basis updates; the buffer must stay exact across deferred flushes
    A, b, c = random_dense_lp(32, 96, seed=13, dtype=np.float32)
    ref = solve_scipy(A, b, c)
    res = solve(
        A, b, c,
        options=SimplexOptions(
            multi_price=8, pricing_dtype=pricing_dtype, update_defer=4,
            refactor_every=32,
        ),
    )
    assert res.status == SolveStatus.OPTIMAL
    assert relative_gap(res.z, ref.z) < 1e-5


def test_multi_price_bounded_lp():
    # native bounded-variable rule with the candidate buffer: bound flips
    # must leave the buffer consistent (no basis change, signs re-derived
    # from at_upper at the next selection)
    rng = np.random.default_rng(21)
    m, n = 12, 36
    A = rng.uniform(0.1, 1.0, (m, n)).astype(np.float32)
    A[:, n - m:] = np.eye(m, dtype=np.float32)
    b = rng.uniform(5.0, 10.0, m).astype(np.float32)
    c = np.concatenate([rng.uniform(0.5, 2.0, n - m), np.zeros(m)]).astype(
        np.float32
    )
    u = np.full(n, np.inf)
    u[: n - m] = rng.uniform(0.2, 1.5, n - m)
    from scipy.optimize import linprog

    ref = linprog(
        -np.asarray(c, np.float64),
        A_eq=np.asarray(A, np.float64),
        b_eq=np.asarray(b, np.float64),
        bounds=[(0.0, None if not np.isfinite(ub) else float(ub)) for ub in u],
        method="highs",
    )
    assert ref.status == 0
    res = solve(A, b, c, u=u, options=SimplexOptions(multi_price=8))
    assert res.status == SolveStatus.OPTIMAL
    assert relative_gap(res.z, -ref.fun) < 1e-5


def test_multi_price_general_route():
    # two-phase + native bounds + driveout with the buffer active in BOTH
    # phases (phase transitions rebuild the state, so the buffer refills)
    from simplex_tpu.core.twophase import solve_general
    from simplex_tpu.oracle.generator import multiperiod_production_lp
    from simplex_tpu.oracle.reference import solve_scipy_general

    lp = multiperiod_production_lp(4, 4, seed=3)
    ref = solve_scipy_general(lp)
    res = solve_general(lp, options=SimplexOptions(multi_price=8))
    assert res.status == SolveStatus.OPTIMAL
    assert relative_gap(res.z, ref.z) < 1e-6


def test_multi_price_checkpoint_resume(tmp_path):
    # chunked solve + mid-solve resume: snapshots do NOT carry the buffer;
    # resume must re-attach an empty one and still reach the optimum
    from simplex_tpu.core.checkpoint import load_checkpoint, solve_with_checkpoints

    A, b, c = random_dense_lp(24, 64, seed=17, dtype=np.float32)
    ref = solve_scipy(A, b, c)
    path = tmp_path / "ckpt.npz"
    opts = SimplexOptions(multi_price=8, checkpoint_every=8)
    snaps = []
    res = solve_with_checkpoints(
        A, b, c, path=path, options=opts, on_chunk=lambda s: snaps.append(s)
    )
    assert res.status == SolveStatus.OPTIMAL
    assert relative_gap(res.z, ref.z) < 1e-5
    assert len(snaps) >= 2  # actually chunked
    st = load_checkpoint(path, A=A, b=b, c=c)
    assert st.cand is None  # ephemeral: never serialized
    # resume from the on-disk snapshot as if the process had died
    res2 = solve_with_checkpoints(A, b, c, path=path, options=opts)
    assert res2.status == SolveStatus.OPTIMAL
    assert relative_gap(res2.z, ref.z) < 1e-5


def test_multi_price_pivot_path_sanity():
    # the buffer must actually amortize: a solve with K=16 on a tall LP
    # reaches the optimum in a comparable pivot count (suboptimization can
    # take somewhat more pivots than global Dantzig — bound the blowup)
    A, b, c = random_dense_lp(32, 512, seed=29, dtype=np.float32)
    base = solve(A, b, c, options=SimplexOptions(refactor_every=64))
    multi = solve(
        A, b, c, options=SimplexOptions(multi_price=16, refactor_every=64)
    )
    assert multi.status == base.status == SolveStatus.OPTIMAL
    assert multi.iters <= 4 * max(base.iters, 8)


@pytest.mark.parametrize("pricing_dtype", ["float32", "bfloat16"])
def test_multi_price_segmented_refills(pricing_dtype):
    # SEGMENTED refills (partial_pricing composed with multi_price): each
    # refill prices one rotating column segment with the dry-segment
    # fallback chain (full shadow -> exact pass). partial_min_segment is
    # lowered so the gate opens at test scale; answers must stay at oracle
    # parity and termination exact.
    m, n = 16, 64
    A, b, c = random_dense_lp(m, n, seed=31, dtype=np.float32)
    ref = solve_scipy(A, b, c)
    res = solve(
        A, b, c,
        options=SimplexOptions(
            multi_price=4, partial_pricing=4, partial_min_segment=4,
            pricing_dtype=pricing_dtype, update_defer=4, refactor_every=32,
        ),
    )
    assert res.status == SolveStatus.OPTIMAL
    assert relative_gap(res.z, ref.z) < 1e-5
    np.testing.assert_allclose(A @ res.x, b, atol=1e-3)


def test_multi_price_segmented_bounded():
    # segmented refills under the native bounded-variable rule: the signed
    # selection must read the CURRENT at_upper through the segment slice
    rng = np.random.default_rng(33)
    m, n = 8, 32
    A = rng.uniform(0.1, 1.0, (m, n)).astype(np.float32)
    A[:, n - m:] = np.eye(m, dtype=np.float32)
    b = rng.uniform(5.0, 10.0, m).astype(np.float32)
    c = np.concatenate([rng.uniform(0.5, 2.0, n - m), np.zeros(m)]).astype(
        np.float32
    )
    u = np.full(n, np.inf)
    u[: n - m] = rng.uniform(0.2, 1.5, n - m)
    from scipy.optimize import linprog

    ref = linprog(
        -np.asarray(c, np.float64),
        A_eq=np.asarray(A, np.float64),
        b_eq=np.asarray(b, np.float64),
        bounds=[(0.0, None if not np.isfinite(ub) else float(ub)) for ub in u],
        method="highs",
    )
    assert ref.status == 0
    res = solve(
        A, b, c, u=u,
        options=SimplexOptions(
            multi_price=4, partial_pricing=4, partial_min_segment=4,
            pricing_dtype="bfloat16",
        ),
    )
    assert res.status == SolveStatus.OPTIMAL
    assert relative_gap(res.z, -ref.fun) < 1e-5


def test_multi_price_segment_gate_requires_shadow():
    # without a pricing shadow (pricing_dtype=float32 -> A_price is None)
    # the segment gate must stay closed and full exact refills still solve
    A, b, c = random_dense_lp(12, 48, seed=35, dtype=np.float32)
    ref = solve_scipy(A, b, c)
    res = solve(
        A, b, c,
        options=SimplexOptions(
            multi_price=4, partial_pricing=4, partial_min_segment=4,
            pricing_dtype="float32",
        ),
    )
    assert res.status == SolveStatus.OPTIMAL
    assert relative_gap(res.z, ref.z) < 1e-5
