"""Cross-mode consistency fuzz: every solver configuration must agree.

One instance, every route — Dantzig (full / shadow / segmented / multiple
pricing), devex, exact steepest edge, the deferred-update flagship, the
batched lane, and the first-order mode — all pinned to the HiGHS oracle
and to each other. This is the whole-framework contract in one test: the
knobs change the PATH, never the answer.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from simplex_tpu import SimplexOptions, SolveStatus, solve
from simplex_tpu.batch.vmapped import solve_batched
from simplex_tpu.fo import solve_pdhg
from simplex_tpu.oracle.generator import random_dense_lp
from simplex_tpu.oracle.reference import relative_gap, solve_scipy

CONFIGS = {
    "dantzig": SimplexOptions(refactor_every=64),
    "shadow": SimplexOptions(pricing_dtype="bfloat16", refactor_every=64),
    "segmented": SimplexOptions(
        partial_pricing=4, partial_min_segment=1, refactor_every=64
    ),
    "multi": SimplexOptions(multi_price=8, refactor_every=64),
    "devex": SimplexOptions(pricing="devex", refactor_every=64),
    "steepest": SimplexOptions(pricing="steepest", refactor_every=64),
    "flagship": SimplexOptions(
        pricing_dtype="bfloat16", partial_pricing=4, partial_min_segment=1,
        update_defer=8, refactor_every=64,
    ),
    "classic-ratio": SimplexOptions(ratio="classic", refactor_every=64),
    "sparse-price": SimplexOptions(pricing_sparse=True, refactor_every=64),
}


# configurations that also run with A as stored tiles (round 3; segmented
# pricing included — per-segment tile structures, sparse.split_columns)
SPARSE_OK = ("dantzig", "shadow", "segmented", "multi", "devex", "steepest",
             "flagship", "classic-ratio")


@pytest.mark.parametrize("seed", [11, 12, 13])
def test_every_route_agrees(seed):
    import scipy.sparse as sps

    A, b, c = random_dense_lp(24, 64, seed=seed)
    ref = solve_scipy(A, b, c)
    assert ref.status == SolveStatus.OPTIMAL
    A_sp = sps.csr_matrix(np.asarray(A))
    for name, opts in CONFIGS.items():
        res = solve(A, b, c, options=opts)
        assert res.status == SolveStatus.OPTIMAL, name
        assert relative_gap(res.z, ref.z) < 1e-5, (name, res.z, ref.z)
        if name in SPARSE_OK:
            # the same route over BlockSparse tiles: storage changes the
            # traffic, never the answer
            rs = solve(A_sp, b, c, options=opts)
            assert rs.status == SolveStatus.OPTIMAL, f"sparse:{name}"
            assert relative_gap(rs.z, ref.z) < 1e-5, (f"sparse:{name}", rs.z)
    bres = solve_batched(A[None], b[None], c[None])
    assert relative_gap(float(bres.z[0]), ref.z) < 1e-4
    fo = solve_pdhg(A, b, c, tol=1e-6)
    assert fo.status == SolveStatus.OPTIMAL
    assert relative_gap(fo.z, ref.z) < 1e-4
