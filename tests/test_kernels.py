"""Pallas kernels vs XLA backend: identical results op-by-op (interpret mode
on CPU) and end-to-end through the solver."""

import jax.numpy as jnp
import numpy as np
import pytest

from simplex_tpu import SimplexOptions, SolveStatus, solve
from simplex_tpu.kernels import pallas_ops as pk
from simplex_tpu.kernels import xla as xk
from simplex_tpu.oracle.generator import random_dense_lp
from simplex_tpu.oracle.reference import relative_gap, solve_scipy


def rand(shape, seed, dtype=np.float32):
    return jnp.asarray(np.random.default_rng(seed).standard_normal(shape), dtype)


@pytest.mark.parametrize("m,n", [(8, 128), (16, 256), (128, 1024)])
def test_pricing_scan_matches_xla(m, n):
    y = rand((m,), 0)
    A = rand((m, n), 1)
    c = rand((n,), 2)
    eps = 1e-6
    min_e, p, pneg = pk.pricing_scan(y, A, c, eps)
    e = np.asarray(xk.reduced_costs(y, A, c))
    np.testing.assert_allclose(float(min_e), e.min(), rtol=1e-5)
    assert int(p) == int(e.argmin())
    negs = np.nonzero(e < -eps)[0]
    expected_neg = int(negs[0]) if len(negs) else pk.INT_MAX
    assert int(pneg) == expected_neg


def test_pricing_scan_tie_break_lowest_index():
    m, n = 8, 256
    y = jnp.zeros((m,), jnp.float32)
    A = jnp.zeros((m, n), jnp.float32)
    c = jnp.zeros((n,), jnp.float32)
    # two equal minima at columns 40 and 200 -> must pick 40
    c = c.at[40].set(5.0).at[200].set(5.0)
    _, p, _ = pk.pricing_scan(y, A, c, 1e-6)
    assert int(p) == 40


def test_pricing_scan_fallback_odd_shapes():
    # shapes not tileable -> xla fallback must still be exact
    m, n = 7, 130
    y, A, c = rand((m,), 3), rand((m, n), 4), rand((n,), 5)
    min_e, p, _ = pk.pricing_scan(y, A, c, 1e-6)
    e = np.asarray(xk.reduced_costs(y, A, c))
    assert int(p) == int(e.argmin())
    np.testing.assert_allclose(float(min_e), e.min(), rtol=1e-6)


@pytest.mark.parametrize("m", [128, 256])
def test_ratio_argmin_matches_xla(m):
    rng = np.random.default_rng(9)
    x_b = jnp.asarray(rng.uniform(0, 1, m), jnp.float32)
    alpha = jnp.asarray(rng.uniform(-1, 1, m), jnp.float32)
    basis = jnp.asarray(rng.permutation(m).astype(np.int32))
    for bland in (False, True):
        flag = jnp.asarray(bland)
        q1, t1, u1 = pk.ratio_argmin(x_b, alpha, basis, 1e-7, flag)
        q2, t2, u2 = xk.ratio_argmin(x_b, alpha, basis, 1e-7, flag)
        assert int(q1) == int(q2)
        np.testing.assert_allclose(float(t1), float(t2), rtol=1e-6)
        assert bool(u1) == bool(u2)


def test_ratio_argmin_unbounded():
    m = 128
    x_b = jnp.ones((m,), jnp.float32)
    alpha = -jnp.ones((m,), jnp.float32)
    basis = jnp.arange(m, dtype=jnp.int32)
    _, _, unb = pk.ratio_argmin(x_b, alpha, basis, 1e-7, jnp.asarray(False))
    assert bool(unb)


@pytest.mark.parametrize("m", [128, 512])
def test_rank1_update_matches_xla(m):
    B = rand((m, m), 11)
    eta = rand((m,), 12)
    row = rand((m,), 13)
    got = pk.rank1_update(B, eta, row)
    want = xk.rank1_update(B, eta, row)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)


def test_solver_end_to_end_pallas_backend():
    # tileable shapes so all three kernels engage (m % 128 == 0 etc.)
    m, n = 128, 512
    A, b, c = random_dense_lp(m, n, seed=31)
    ref = solve_scipy(A, b, c)
    res = solve(A, b, c, options=SimplexOptions(backend="pallas"))
    res_x = solve(A, b, c, options=SimplexOptions(backend="xla"))
    assert res.status == SolveStatus.OPTIMAL
    assert relative_gap(res.z, ref.z) < 1e-5
    # identical pivot path as the XLA backend
    assert res.iters == res_x.iters
    np.testing.assert_array_equal(res.basis, res_x.basis)


def test_fused_ratio_eta_escape_hatch(monkeypatch):
    import importlib

    import jax.numpy as jnp

    from simplex_tpu.kernels import pallas_ops

    x_b = jnp.arange(1.0, 129.0, dtype=jnp.float32)
    alpha = jnp.ones(128, jnp.float32)
    basis = jnp.arange(128, dtype=jnp.int32)
    assert (
        pallas_ops.ratio_eta(x_b, alpha, basis, 1e-7, jnp.asarray(False), True)
        is None  # off by default
    )
    monkeypatch.setenv("SIMPLEX_TPU_FUSED", "1")
    out = pallas_ops.ratio_eta(x_b, alpha, basis, 1e-7, jnp.asarray(False), True)
    assert out is not None
    q, theta_q, unb, eta, xbnew = out
    assert int(q) == 0 and not bool(unb)
