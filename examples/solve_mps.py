"""Solve an MPS instance end-to-end (bounds, mixed rows, duals).

Usage: python examples/solve_mps.py [path/to/instance.mps]
Defaults to the bundled bounded production-planning fixture.
"""

import sys

import numpy as np

from simplex_tpu import GeneralLP, read_mps, solve_general
from simplex_tpu.status import SolveStatus


def main() -> None:
    path = sys.argv[1] if len(sys.argv) > 1 else "tests/data/prod_bounded.mps"
    prob = read_mps(path)
    print(f"{prob.name}: {prob.A.shape[0]} rows x {prob.A.shape[1]} cols, "
          f"{'max' if prob.maximize else 'min'}")

    # the solver always maximizes; flip the costs for a minimize instance
    c = prob.c if prob.maximize else -prob.c
    lp = GeneralLP(
        A=prob.A, b=prob.b, c=c, row_types=prob.row_types,
        lower=prob.lower, upper=prob.upper,
    )
    res = solve_general(lp)
    if res.status != SolveStatus.OPTIMAL:
        print("status:", res.status.name)
        return
    obj = (res.z if prob.maximize else -res.z) + prob.c0
    print(f"optimum: {obj:g}  ({res.iters} pivots, "
          f"{res.phase1_iters} in phase 1)")
    for name, v in zip(prob.col_names, res.x):
        if abs(v) > 1e-9:
            print(f"  {name} = {v:g}")
    if res.y is not None:
        # duals back in the instance's own sense (the solver maximizes; a
        # minimize instance was solved with -c, so its duals are -y)
        y = res.y if prob.maximize else -res.y
        print("row duals:", np.round(y, 6))


if __name__ == "__main__":
    main()
