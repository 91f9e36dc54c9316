"""Two-phase simplex for general-form LPs.

The reference only accepts problems already in canonical form with a feasible
slack basis (``src/v1_baseline.cu:336-339``) — infeasible starts, >= / =
rows, and negative right-hand sides are simply outside its domain. This
module closes that gap the standard way:

  Phase 1  maximize -(sum of artificials) from the artificial basis;
           optimum 0 iff the original LP is feasible.
  Cleanup  drive basic-at-zero artificials out of the basis by a host-side
           pivot (or leave them pinned at zero for redundant rows).
  Phase 2  re-solve with the true objective from the phase-1 basis,
           artificials blocked by a large negative cost.

Both phases run the same jitted device solver; the between-phase bookkeeping
is O(m^2) host numpy.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Sequence

import numpy as np

from simplex_tpu.config import DEFAULT_OPTIONS, SimplexOptions
from simplex_tpu.core.solver import SolveResult, solve
from simplex_tpu.status import SolveStatus


class GeneralLP(NamedTuple):
    """maximize c.x  s.t.  row_i: A_i x (<= | >= | ==) b_i,  x >= 0."""

    A: np.ndarray
    b: np.ndarray
    c: np.ndarray
    row_types: Sequence[str]  # 'L', 'G', or 'E' per row


class GeneralSolveResult(NamedTuple):
    z: float
    x: np.ndarray  # (k,) structural variables only
    status: SolveStatus
    iters: int  # total pivots across both phases
    phase1_iters: int


def _standardize(lp: GeneralLP):
    """Equality form with slacks/surpluses and artificial columns.

    Returns (A_std, b_std, c_std (phase-2 costs), k_struct, n_real,
    artificial column indices, phase-1 basis).
    """
    A = np.asarray(lp.A, np.float64)
    b = np.asarray(lp.b, np.float64).copy()
    c = np.asarray(lp.c, np.float64)
    m, k = A.shape
    if len(lp.row_types) != m:
        raise ValueError("row_types length != m")

    # flip rows so b >= 0 (L <-> G under negation)
    types = []
    A = A.copy()
    for i, t in enumerate(lp.row_types):
        t = t.upper()
        if t not in ("L", "G", "E"):
            raise ValueError(f"bad row type {t!r}")
        if b[i] < 0:
            A[i] *= -1
            b[i] *= -1
            t = {"L": "G", "G": "L", "E": "E"}[t]
        types.append(t)

    slack_cols = []  # (row, sign)
    for i, t in enumerate(types):
        if t == "L":
            slack_cols.append((i, 1.0))
        elif t == "G":
            slack_cols.append((i, -1.0))
    S = np.zeros((m, len(slack_cols)))
    basis_from_slack = {}
    for j, (i, sgn) in enumerate(slack_cols):
        S[i, j] = sgn
        if sgn > 0:
            basis_from_slack[i] = k + j  # +1 slack can start basic

    # artificials for rows with no +1 slack
    art_rows = [i for i in range(m) if i not in basis_from_slack]
    R = np.zeros((m, len(art_rows)))
    for j, i in enumerate(art_rows):
        R[i, j] = 1.0

    A_std = np.concatenate([A, S, R], axis=1)
    n_real = k + S.shape[1]
    art_cols = np.arange(n_real, n_real + len(art_rows), dtype=np.int32)
    basis1 = np.empty(m, np.int32)
    for i in range(m):
        if i in basis_from_slack:
            basis1[i] = basis_from_slack[i]
    for j, i in enumerate(art_rows):
        basis1[i] = art_cols[j]
    return A_std, b, c, k, n_real, art_cols, basis1


def _drive_out_artificials(A_std, basis, art_set, tol=1e-7):
    """Replace basic artificials (at value ~0) with non-artificial columns.

    Host-side: for each basic artificial in row r, pick any non-artificial,
    nonbasic column j with |(B_inv A)_{r,j}| > tol and swap it in (classic
    phase-1 cleanup). A row with no such column is redundant; its artificial
    stays basic, pinned at zero by the phase-2 cost.
    """
    basis = basis.copy()
    m = len(basis)
    in_basis = set(basis.tolist())
    art_rows = [r for r in range(m) if basis[r] in art_set]
    if not art_rows:
        return basis
    B = A_std[:, basis]
    B_inv = np.linalg.inv(B)
    for r in art_rows:
        row = B_inv[r] @ A_std  # (n,)
        cand = [
            j
            for j in range(A_std.shape[1])
            if j not in in_basis and j not in art_set and abs(row[j]) > tol
        ]
        if not cand:
            continue  # redundant row
        j = cand[0]
        in_basis.discard(int(basis[r]))
        in_basis.add(j)
        basis[r] = j
        B_inv = np.linalg.inv(A_std[:, basis])
    return basis


def solve_general(
    lp: GeneralLP,
    *,
    options: SimplexOptions = DEFAULT_OPTIONS,
    phase2_artificial_cost: Optional[float] = None,
) -> GeneralSolveResult:
    """Solve a general-form LP by two-phase simplex on the device solver."""
    A_std, b, c, k, n_real, art_cols, basis1 = _standardize(lp)
    m, n = A_std.shape
    art_set = set(art_cols.tolist())

    p1_iters = 0
    basis = basis1
    if len(art_cols) > 0:
        # Phase 1: max -(sum of artificials)
        c1 = np.zeros(n)
        c1[art_cols] = -1.0
        r1 = solve(A_std, b, c1, basis0=basis1, options=options)
        p1_iters = r1.iters
        if r1.status not in (SolveStatus.OPTIMAL,):
            return GeneralSolveResult(
                z=float("nan"), x=np.zeros(k), status=r1.status, iters=p1_iters,
                phase1_iters=p1_iters,
            )
        feas_tol = 1e-5 if options.dtype == np.float32 else 1e-8
        if r1.z < -feas_tol * max(1.0, abs(b).max()):
            # artificials cannot all reach zero: no feasible point exists
            return GeneralSolveResult(
                z=float("nan"), x=np.zeros(k), status=SolveStatus.INFEASIBLE,
                iters=p1_iters, phase1_iters=p1_iters,
            )
        basis = _drive_out_artificials(A_std, r1.basis, art_set)

    # Phase 2: true objective; artificials blocked by a large negative cost
    c2 = np.zeros(n)
    c2[:k] = c
    big = phase2_artificial_cost
    if big is None:
        big = -1e4 * max(1.0, float(np.abs(c).max()))
    iters2 = 0
    art_tol = 1e-5 * max(1.0, float(np.abs(b).max()))
    for _ in range(3):
        if len(art_cols) > 0:
            c2[art_cols] = big
        r2 = solve(A_std, b, c2, basis0=basis, options=options)
        iters2 += r2.iters
        # an artificial re-entering at a nonzero value means the penalty was
        # too small for this problem's duals: the "solution" would violate
        # the original constraints by exactly that value. Escalate and
        # re-solve from the same basis instead of reporting it as OPTIMAL.
        art_resid = (
            float(np.abs(r2.x[art_cols]).max()) if len(art_cols) else 0.0
        )
        if art_resid <= art_tol or r2.status != SolveStatus.OPTIMAL:
            break
        big *= 1e3
        basis = r2.basis
    status = r2.status
    if status == SolveStatus.OPTIMAL and art_resid > art_tol:
        status = SolveStatus.SINGULAR  # could not pin the artificials at 0
    x = r2.x[:k]
    z = float(np.dot(c, x))
    return GeneralSolveResult(
        z=z,
        x=x,
        status=status,
        iters=p1_iters + iters2,
        phase1_iters=p1_iters,
    )
