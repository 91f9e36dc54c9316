"""The fully sparse pipeline, end to end (second half of round 3).

Everything below runs WITHOUT dense A ever materializing — on device or
host: the MPS reader emits scipy csc straight from the COLUMNS triplets,
the two-phase standardization stays sparse, the core solver prices /
ftrans / refactorizes over BlockSparse tiles, and serving (dual warm
restarts, batched scenarios), checkpointing, ranging, and the
column-sharded distributed mode all read tiles too.

Run on CPU for a laptop demo:  python examples/sparse_pipeline.py --cpu
"""

import sys
import tempfile

import jax
import numpy as np
import scipy.sparse as sps

if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")

from simplex_tpu import solve
from simplex_tpu.batch.vmapped import reoptimize_batched
from simplex_tpu.core.checkpoint import solve_with_checkpoints
from simplex_tpu.core.twophase import solve_general
from simplex_tpu.oracle.generator import multiperiod_production_lp


def main() -> None:
    # --- a netlib-class structured instance, kept sparse from the start ---
    lp = multiperiod_production_lp(16, 10, seed=0)  # 176 rows, bounds on all
    lp_sparse = lp._replace(A=sps.csc_matrix(np.asarray(lp.A)))
    res = solve_general(lp_sparse)
    print(
        f"sparse general solve: {res.status.name}  z={res.z:.4f}  "
        f"({res.iters} pivots, {res.phase1_iters} in phase 1)"
    )

    # --- canonical-form sparse: core solve + batched scenario serving ---
    rng = np.random.default_rng(3)
    m, k = 48, 120
    A0 = rng.uniform(0.2, 1.5, (m, k))
    A0[rng.uniform(size=A0.shape) > 0.15] = 0.0
    A = sps.csr_matrix(np.hstack([A0, np.eye(m)]).astype(np.float32))
    b = (A0 @ rng.uniform(0.2, 0.8, k) + rng.uniform(0.1, 1.0, m)).astype(
        np.float32
    )
    c = np.concatenate([rng.uniform(0.5, 2, k), np.zeros(m)]).astype(
        np.float32
    )
    c[:k] *= (A0 != 0).any(axis=0)  # no profit on dropped columns
    cold = solve(A, b, c)
    print(f"sparse core solve:    {cold.status.name}  z={cold.z:.4f}")

    scenarios = np.stack(
        [b * rng.uniform(0.92, 1.08, size=b.shape) for _ in range(8)]
    ).astype(np.float32)
    served = reoptimize_batched(A, scenarios, c, cold)
    print(
        "served 8 what-if RHS scenarios warm (pivots per scenario: "
        f"{served.iters.tolist()})"
    )

    # --- long solves snapshot + resume from tiles too ---
    with tempfile.TemporaryDirectory() as td:
        ck = solve_with_checkpoints(A, b, c, path=f"{td}/state.npz")
        print(f"checkpointed solve:   {ck.status.name}  z={ck.z:.4f}")


if __name__ == "__main__":
    main()
