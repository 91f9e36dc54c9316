"""Round-3 features in one script: sensitivity ranging, dual-simplex warm
restarts after RHS changes, and the sparse + bounded first-order mode.

Run on CPU for a laptop demo:  python examples/warm_restart_and_sparse.py --cpu
"""

import sys

import jax
import numpy as np

if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")

from simplex_tpu import solve
from simplex_tpu import sparse as bsp
from simplex_tpu.analysis import ranging, reoptimize
from simplex_tpu.fo import solve_pdhg
from simplex_tpu.io.canonical import to_equality_form
from simplex_tpu.oracle.generator import (
    multiperiod_production_lp,
    random_dense_lp,
)


def main() -> None:
    # --- solve once, then serve RHS changes from the warm basis ---
    A, b, c = random_dense_lp(48, 120, seed=7)
    cold = solve(A, b, c)
    print(f"cold solve:  z={cold.z:.4f}  ({cold.iters} pivots)")

    rng = ranging(A, b, c, cold.basis)
    print(
        "ranging: b_0 may move by "
        f"[{rng.b_lo[0]:+.3g}, {rng.b_hi[0]:+.3g}] at rate y_0={rng.y[0]:.3g}"
    )

    # inside the band: the SAME basis re-prices in 0 pivots
    b_in = b.copy()
    b_in[0] += 0.4 * min(rng.b_hi[0], 1e6)
    warm_in = reoptimize(A, b_in, c, cold)
    print(f"inside band: z={warm_in.z:.4f}  ({warm_in.iters} pivots)")

    # outside: the dual simplex walks to the new optimal basis (a uniform
    # scaling of b would keep the same basis — perturb each row differently)
    prng = np.random.default_rng(3)
    b_out = (
        np.asarray(b, np.float64) * (1 + 0.3 * prng.uniform(-1, 1, b.shape))
    ).astype(b.dtype)
    warm_out = reoptimize(A, b_out, c, cold)
    print(
        f"+-30% RHS:   z={warm_out.z:.4f}  ({warm_out.iters} warm pivots "
        f"vs {cold.iters} cold)"
    )

    # --- sparse + bounded first-order mode on a netlib-class instance ---
    lp = multiperiod_production_lp(16, 8, seed=1)  # 144 rows, 384 bounded
    eq = to_equality_form(lp)
    A_eq, b_eq, c_eq, u_eq = eq.A, eq.b, eq.c, eq.u
    M = bsp.from_dense(A_eq.astype(np.float32), block_shape=(64, 64))
    print(
        f"\nmultiperiod {A_eq.shape[0]}x{A_eq.shape[1]}: "
        f"{M.n_tiles} stored tiles (tile density {M.tile_density():.2f})"
    )
    res = solve_pdhg(
        M,
        b_eq.astype(np.float32),
        c_eq.astype(np.float32),
        u=u_eq.astype(np.float32),
        tol=1e-4,
    )
    print(
        f"sparse PDHG: z={res.z:.4f} {res.status.name} "
        f"({res.iters} iterations, KKT {max(res.primal_res, res.dual_res):.1e})"
    )


if __name__ == "__main__":
    main()
