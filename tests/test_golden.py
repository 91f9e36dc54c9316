"""Golden test: the reference's bundled sample LP with known optimum.

Reference: `input/sample.txt:15-16` documents optimum 9 at x0=1, x1=3; the
reference's only correctness check is running each solver version on this
file and eyeballing the output (`Makefile:57-59`). Here it is automated.
"""

import os

import numpy as np
import pytest

from simplex_tpu import SimplexOptions, SolveStatus, load_lp, solve

SAMPLE = os.path.join(os.path.dirname(__file__), "data", "sample.txt")


def test_load_sample():
    A, b, c = load_lp(SAMPLE)
    assert A.shape == (2, 4)
    np.testing.assert_allclose(A, [[1, 1, 1, 0], [2, 1, 0, 1]])
    np.testing.assert_allclose(b, [4, 5])
    np.testing.assert_allclose(c, [3, 2, 0, 0])


@pytest.mark.parametrize("backend", ["xla"])
def test_sample_optimum(backend):
    A, b, c = load_lp(SAMPLE)
    res = solve(A, b, c, options=SimplexOptions(backend=backend))
    assert res.status == SolveStatus.OPTIMAL
    assert res.z == pytest.approx(9.0, abs=1e-5)
    np.testing.assert_allclose(res.x[:2], [1.0, 3.0], atol=1e-5)
    np.testing.assert_allclose(res.x[2:], [0.0, 0.0], atol=1e-5)


def test_sample_float64():
    A, b, c = load_lp(SAMPLE, dtype=np.float64)
    import jax.numpy as jnp

    res = solve(A, b, c, options=SimplexOptions(dtype=jnp.float64))
    assert res.status == SolveStatus.OPTIMAL
    assert res.z == pytest.approx(9.0, abs=1e-12)


def test_explicit_basis_matches_slack_init():
    A, b, c = load_lp(SAMPLE)
    res_a = solve(A, b, c)
    res_b = solve(A, b, c, basis0=np.array([2, 3]))
    assert res_a.z == pytest.approx(res_b.z, abs=1e-6)
    np.testing.assert_array_equal(res_a.basis, res_b.basis)


def test_unbounded_detected():
    # max x0 s.t. -x0 + x1 + s = 1: x0 can grow without bound.
    A = np.array([[-1.0, 1.0, 1.0]])
    b = np.array([1.0])
    c = np.array([1.0, 0.0, 0.0])
    res = solve(A, b, c)
    assert res.status == SolveStatus.UNBOUNDED


def test_already_optimal():
    # all costs <= 0 for structural vars: slack basis is optimal, z = 0.
    A = np.array([[1.0, 1.0, 0.0], [1.0, 0.0, 1.0]])
    b = np.array([1.0, 2.0])
    c = np.array([-1.0, 0.0, 0.0])
    res = solve(A, b, c)
    assert res.status == SolveStatus.OPTIMAL
    assert res.z == pytest.approx(0.0)
    assert res.iters == 0


def test_rejects_m_gt_n():
    with pytest.raises(ValueError):
        solve(np.zeros((3, 2)), np.zeros(3), np.zeros(2))


def test_feas_err_reported():
    # the golden sample solves exactly: feasibility error must be ~0, and
    # the field must exist (honest infeasibility reporting — solver state is
    # never clamped, see core/step.py refactorize)
    from simplex_tpu import solve
    from simplex_tpu.io.text import load_lp

    A, b, c = load_lp("tests/data/sample.txt")
    res = solve(A, b, c)
    assert hasattr(res, "feas_err")
    assert res.feas_err < 1e-9
