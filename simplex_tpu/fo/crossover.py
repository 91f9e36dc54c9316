"""Crossover: purify a first-order (PDHG) solution to an exact vertex.

The classic PDLP-to-simplex handoff (cuPDLP pairs with a crossover for
users needing basic solutions): a converged PDHG point sits in the
INTERIOR of the optimal face at tol-relative accuracy; many consumers
(ranging, warm restarts, integer-programming branching) need an exact
BASIC optimum. This module identifies a basis from the first-order point
and hands it to the simplex core:

  1. basis identification — QR with column pivoting on A with columns
     scaled by the first-order solution's activity (x_j, or the distance
     INTO the box for bounded columns), so large-activity independent
     columns enter the basis first (the slack of a QR pivot ordering is
     exactly what we want: a well-conditioned basis covering the support);
  2. nonbasic placement — near-upper columns are parked at their bound
     (``at_upper0``), the rest at zero;
  3. warm primal cleanup — ``solve(basis0=...)``: x_B = B^-1 b_eff starts
     within O(tol) of feasibility (the ratio test already tolerates
     Harris-sized violations) and the pivot loop walks the few steps from
     the face interior to the optimal vertex, with the full OPTIMAL
     contract (verify_terminal, f64 polish, feas_err, duals).

Cost: one host QR with pivoting, O(m^2 n) — crossover is a once-per-solve
finisher, not a hot path. A singular identified basis surfaces as a
SINGULAR solve; callers can fall back to a cold solve.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from simplex_tpu.config import DEFAULT_OPTIONS, SimplexOptions
from simplex_tpu.core.solver import SolveResult, solve


def identify_basis(A, x, u=None):
    """Pick m independent columns, preferring the first-order support.

    Column weights: activity x_j measured INTO the box — a column parked
    at either bound is inactive (weight ~0) and should stay nonbasic;
    interior columns carry their distance to the nearer bound. Weights
    scale a copy of A, and QR column pivoting returns independent columns
    in decreasing scaled-norm order. Returns ``(basis, at_upper0)``.
    """
    from scipy.linalg import qr

    import scipy.sparse as sps

    if sps.issparse(A):
        # the pivoted QR below is inherently dense; a sparse caller pays
        # one m x n densification HERE only (the cleanup solve afterwards
        # goes back through the sparse core)
        A = A.toarray()
    A = np.asarray(A, np.float64)
    m, n = A.shape
    x = np.asarray(x, np.float64)
    w = np.maximum(x, 0.0).copy()
    up_mask = np.zeros(n, bool)
    if u is not None:
        u64 = np.asarray(u, np.float64)
        finite = np.isfinite(u64)
        scale = 1.0 + np.where(finite, u64, 0.0)
        near_up = finite & (u64 - x <= 1e-5 * scale)
        up_mask = near_up
        # activity = distance to the NEARER bound (0 at either bound)
        w = np.where(finite, np.minimum(w, np.maximum(u64 - x, 0.0)), w)
    # floor: zero-weight columns must still be orderable (QR needs nonzero
    # columns to rank them; a tiny floor keeps their relative norms)
    col_norm = np.maximum(np.linalg.norm(A, axis=0), 1e-30)
    wn = w / (1.0 + np.abs(w).max())
    Aw = A * (wn + 1e-9)[None, :] / col_norm[None, :]
    _q, _r, piv = qr(Aw, mode="economic", pivoting=True)
    basis = np.sort(np.asarray(piv[:m], np.int32))
    at_upper0 = up_mask.copy()
    at_upper0[basis] = False
    return basis, at_upper0


def crossover(
    A,
    b,
    c,
    fo_result,
    *,
    u=None,
    options: SimplexOptions = DEFAULT_OPTIONS,
) -> SolveResult:
    """Vertex-purify a :class:`~simplex_tpu.fo.pdhg.PDHGResult`.

    Returns the simplex core's :class:`SolveResult` (exact basic optimum,
    duals, feas_err) reached in a handful of pivots from the first-order
    point's face. ``fo_result`` may be any object with an ``x`` attribute
    of length n. The instance must be the same one the first-order solve
    saw (dense here — crossover builds an explicit basis anyway; for a
    BlockSparse solve pass the dense or scipy form of A).
    """
    x = np.asarray(fo_result.x, np.float64)
    basis0, at_upper0 = identify_basis(A, x, u=u)
    # A passes through untouched: solve() takes scipy.sparse / BlockSparse
    # natively (the cleanup then runs on the sparse core)
    return solve(
        A,
        b,
        c,
        u=u,
        basis0=basis0,
        at_upper0=at_upper0 if u is not None else None,
        options=options,
    )
