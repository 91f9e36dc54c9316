"""Trace mode: per-pivot records match the jitted solve's final answer (the
automated 'PRINT-mode hand-verification' of SURVEY.md §4 point 3)."""

import io

import numpy as np

from simplex_tpu import solve
from simplex_tpu.core.trace import print_trace, trace_pivots
from simplex_tpu.oracle.generator import random_dense_lp
from simplex_tpu.status import SolveStatus


def test_trace_reaches_same_optimum():
    A, b, c = random_dense_lp(8, 20, seed=13)
    direct = solve(A, b, c)
    records = list(trace_pivots(A, b, c))
    assert records[-1].status == SolveStatus.OPTIMAL
    assert abs(records[-1].objective - direct.z) < 1e-5
    np.testing.assert_array_equal(records[-1].basis, direct.basis)
    # one record per pivot plus the terminal one
    assert len(records) == direct.iters + 1


def test_trace_golden_sample_pivot_path():
    # the bundled 2x4 sample: known 2-pivot path to optimum 9
    A = np.array([[1.0, 1, 1, 0], [2, 1, 0, 1]], np.float32)
    b = np.array([4.0, 5], np.float32)
    c = np.array([3.0, 2, 0, 0], np.float32)
    recs = list(trace_pivots(A, b, c))
    assert [r.entering for r in recs] == [0, 1, -1]
    assert recs[0].theta == 2.5 and recs[1].theta == 3.0
    assert recs[-1].objective == 9.0


def test_print_trace_output():
    A, b, c = random_dense_lp(4, 10, seed=14)
    buf = io.StringIO()
    print_trace(A, b, c, file=buf, verbose=True)
    out = buf.getvalue()
    assert "# Iteration 1" in out
    assert "entering x_" in out
    assert "Optimum found." in out


def test_trace_dual_pivots():
    """dual=True traces the dual loop: violations decrease to feasibility
    and the basis transitions match a solve_dual run's pivot count."""
    import numpy as np

    from simplex_tpu import SimplexOptions, SolveStatus, solve
    from simplex_tpu.core.trace import trace_pivots
    from simplex_tpu.oracle.generator import random_dense_lp

    A, b, c = random_dense_lp(12, 30, seed=15)
    cold = solve(A, b, c, options=SimplexOptions(refactor_every=64))
    rng = np.random.default_rng(7)
    b2 = (np.asarray(b, np.float64) * (1 + 0.3 * rng.uniform(-1, 1, b.shape))).astype(
        np.float32
    )
    recs = list(
        trace_pivots(
            A, b2, c, basis0=cold.basis, dual=True,
            options=SimplexOptions(verify_terminal=False),
        )
    )
    assert recs, "no records"
    assert recs[-1].status in (SolveStatus.OPTIMAL, SolveStatus.INFEASIBLE)
    if recs[-1].status == SolveStatus.OPTIMAL:
        # terminal point is primal feasible
        assert recs[-1].x_b.min() > -1e-4
    # entering/leaving derived for every non-terminal transition
    for r in recs[:-1]:
        assert r.entering >= 0 and r.leaving >= 0
