"""Mixed-precision (bfloat16) pricing: correctness must be unchanged.

The bf16 pricing shadow (``SimplexOptions.pricing_dtype="bfloat16"``) halves
the dominant HBM read per pivot; these tests pin the contract that it changes
only the pivot *path*: every candidate is re-verified in f32 and termination
always comes from an exact pass, so objectives still meet the oracle parity
gate (BASELINE.json: 1e-6 relative).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from simplex_tpu import SimplexOptions, SolveStatus, solve
from simplex_tpu.oracle.generator import random_dense_lp
from simplex_tpu.oracle.reference import relative_gap, solve_scipy

SIZES = [(4, 10), (16, 40), (48, 120)]


@pytest.mark.parametrize("m,n", SIZES)
@pytest.mark.parametrize("pricing", ["dantzig", "devex"])
def test_bf16_pricing_matches_oracle(m, n, pricing):
    A, b, c = random_dense_lp(m, n, seed=5, dtype=np.float32)
    ref = solve_scipy(A, b, c)
    assert ref.status == SolveStatus.OPTIMAL
    res = solve(
        A, b, c,
        options=SimplexOptions(
            pricing=pricing, pricing_dtype="bfloat16", refactor_every=64
        ),
    )
    assert res.status == SolveStatus.OPTIMAL
    assert relative_gap(res.z, ref.z) < 1e-5
    np.testing.assert_allclose(A @ res.x, b, atol=1e-3)
    assert np.all(res.x >= -1e-4)


def test_bf16_pricing_golden_sample():
    # the reference's golden LP: optimum 9 at x0=1, x1=3 (input/sample.txt:15-16)
    A = np.array([[2.0, 1, 1, 0], [1, 3, 0, 1]], np.float32)
    b = np.array([5.0, 10.0], np.float32)
    c = np.array([3.0, 2, 0, 0], np.float32)
    res = solve(A, b, c, options=SimplexOptions(pricing_dtype="bfloat16"))
    assert res.status == SolveStatus.OPTIMAL
    assert abs(res.z - 9.0) < 1e-5
    np.testing.assert_allclose(res.x[:2], [1.0, 3.0], atol=1e-5)


def test_bf16_pricing_degenerate_bland_terminates():
    # Bland's rule requires exact first-eligible-index pricing; the mixed
    # path must route Bland iterations through the exact f32 pass.
    A, b, c = random_dense_lp(24, 60, seed=11, dtype=np.float32, degenerate=True)
    ref = solve_scipy(A, b, c)
    res = solve(
        A, b, c,
        options=SimplexOptions(
            pricing_dtype="bfloat16", bland_after=8, refactor_every=32
        ),
    )
    assert res.status == SolveStatus.OPTIMAL
    assert relative_gap(res.z, ref.z) < 1e-4


def test_bf16_pricing_unbounded_detected():
    # max x0 s.t. x0 - x1 + s = 1 : increasing x0 with x1 is unbounded
    A = np.array([[1.0, -1.0, 1.0]], np.float32)
    b = np.array([1.0], np.float32)
    c = np.array([1.0, 1.0, 0.0], np.float32)
    res = solve(A, b, c, options=SimplexOptions(pricing_dtype="bfloat16"))
    assert res.status == SolveStatus.UNBOUNDED


def test_bf16_pricing_batched():
    from simplex_tpu.batch.vmapped import solve_batched

    rng_lps = [random_dense_lp(8, 20, seed=s, dtype=np.float32) for s in range(4)]
    As = np.stack([lp[0] for lp in rng_lps])
    bs = np.stack([lp[1] for lp in rng_lps])
    cs = np.stack([lp[2] for lp in rng_lps])
    res = solve_batched(
        As, bs, cs, options=SimplexOptions(pricing_dtype="bfloat16")
    )
    for i in range(4):
        ref = solve_scipy(As[i], bs[i], cs[i])
        assert SolveStatus(int(res.status[i])) == SolveStatus.OPTIMAL
        assert relative_gap(float(res.z[i]), ref.z) < 1e-4


def test_bf16_pricing_sharded():
    import jax

    from simplex_tpu.dist.mesh import COLS_AXIS, make_mesh
    from simplex_tpu.dist.sharded import solve_sharded

    mesh = make_mesh(axis_names=(COLS_AXIS,), devices=jax.devices()[:4])
    A, b, c = random_dense_lp(12, 32, seed=3, dtype=np.float32)
    ref = solve_scipy(A, b, c)
    res = solve_sharded(
        A, b, c, mesh, options=SimplexOptions(pricing_dtype="bfloat16")
    )
    assert res.status == SolveStatus.OPTIMAL
    assert relative_gap(res.z, ref.z) < 1e-4


def test_bf16_shadow_attached_only_when_requested():
    from simplex_tpu.core.state import Problem, with_pricing_shadow

    A = jnp.ones((2, 4), jnp.float32)
    prob = Problem(A, jnp.ones(2), jnp.ones(4))
    assert with_pricing_shadow(prob, "float32").A_price is None
    shadow = with_pricing_shadow(prob, "bfloat16").A_price
    assert shadow is not None
    assert shadow.dtype == jnp.bfloat16
    assert shadow.shape == A.shape


@pytest.mark.parametrize("pricing_dtype", ["float32", "bfloat16"])
def test_partial_pricing_matches_oracle(pricing_dtype):
    # n/S = 512: large enough that the segmented path is actually active
    # (see core.step._partial_active)
    A, b, c = random_dense_lp(16, 2048, seed=19, dtype=np.float32)
    ref = solve_scipy(A, b, c)
    res = solve(
        A, b, c,
        options=SimplexOptions(
            partial_pricing=4, pricing_dtype=pricing_dtype, refactor_every=32
        ),
    )
    assert res.status == SolveStatus.OPTIMAL
    assert relative_gap(res.z, ref.z) < 1e-5
    assert len(np.unique(res.basis)) == len(res.basis)


def test_partial_pricing_non_divisible_falls_back():
    # n=41 not divisible by 4: silently uses full pricing (same answer)
    A, b, c = random_dense_lp(16, 41, seed=20, dtype=np.float32)
    ref = solve_scipy(A, b, c)
    res = solve(A, b, c, options=SimplexOptions(partial_pricing=4))
    assert res.status == SolveStatus.OPTIMAL
    assert relative_gap(res.z, ref.z) < 1e-5


def test_partial_pricing_small_segment_guard():
    from simplex_tpu.core.state import Problem
    from simplex_tpu.core.step import _partial_active

    import jax.numpy as jnp

    small = Problem(jnp.ones((4, 40)), jnp.ones(4), jnp.ones(40))
    big = Problem(jnp.ones((4, 4096)), jnp.ones(4), jnp.ones(4096))
    opts = SimplexOptions(partial_pricing=8)
    assert not _partial_active(opts, small)  # 5-column segments: not worth it
    assert _partial_active(opts, big)  # 512-column segments


def test_partial_pricing_unbounded():
    # unbounded detection with the segmented path genuinely active
    rng = np.random.default_rng(5)
    m, n = 2, 2048
    A = rng.uniform(0.1, 1.0, (m, n)).astype(np.float32)
    A[:, 5] = [-1.0, -0.5]  # a column that can grow without bound
    A[:, n - m:] = np.eye(m, dtype=np.float32)
    b = np.array([1.0, 2.0], np.float32)
    c = np.zeros(n, np.float32)
    c[5] = 1.0
    res = solve(A, b, c, options=SimplexOptions(partial_pricing=2))
    assert res.status == SolveStatus.UNBOUNDED
