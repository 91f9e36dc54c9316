"""Canonicalization: turn general LPs into the solver's canonical form and
pad shapes to TPU-friendly multiples.

The reference requires the input to ALREADY be canonical with a trailing
identity slack block (``src/v1_baseline.cu:336-339``) and ships a converter
that does NOT actually produce that form (``glpk_interface.cpp`` ignores
bounds and never adds slack columns — SURVEY.md §2.2). This module is the
working version of that converter, plus TPU padding the reference has no
analogue for.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import numpy as np


class CanonicalLP(NamedTuple):
    A: np.ndarray  # (m, n) with A[:, basis0] = I
    b: np.ndarray  # (m,)  >= 0
    c: np.ndarray  # (n,)
    basis0: np.ndarray  # (m,) int32 — feasible starting basis (slack block)
    n_structural: int  # columns of the original problem (prefix of A)


def from_inequalities(A_ub, b_ub, c) -> CanonicalLP:
    """max c.x  s.t.  A_ub x <= b_ub, x >= 0  ->  canonical form with slacks.

    Requires b_ub >= 0 (so the slack basis is feasible) — the same implicit
    requirement the reference places on its inputs.
    """
    A_ub = np.asarray(A_ub, np.float64)
    b_ub = np.asarray(b_ub, np.float64)
    c = np.asarray(c, np.float64)
    m, k = A_ub.shape
    if np.any(b_ub < 0):
        raise ValueError(
            "b must be nonnegative for a feasible slack basis (phase-1 "
            "bootstrap not required by the reference; see solve_two_phase "
            "for general right-hand sides)"
        )
    A = np.concatenate([A_ub, np.eye(m)], axis=1)
    c_full = np.concatenate([c, np.zeros(m)])
    basis0 = np.arange(k, k + m, dtype=np.int32)
    return CanonicalLP(A, b_ub.copy(), c_full, basis0, k)


def pad_columns(
    A: np.ndarray, c: np.ndarray, multiple: int, cost: float = -1.0
) -> Tuple[np.ndarray, np.ndarray]:
    """Pad n up to a multiple (mesh divisibility / lane alignment 128).

    Padding columns are all-zero with negative cost, so their reduced cost
    e_j = y.0 - c_j = -cost > 0 — they can never enter the basis and the
    solve is bitwise-unaffected (verified in tests/test_io.py).
    """
    m, n = A.shape
    n_pad = (-n) % multiple
    if n_pad == 0:
        return A, c
    A2 = np.concatenate([A, np.zeros((m, n_pad), A.dtype)], axis=1)
    c2 = np.concatenate([c, np.full(n_pad, cost, c.dtype)])
    return A2, c2


def pad_rows(
    A: np.ndarray, b: np.ndarray, c: np.ndarray, multiple: int
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Pad m up to a multiple (sublane alignment 8) with vacuous constraints.

    Each padding row is all-zero except a fresh slack column (0.x + s = 1),
    so the padded LP has the same optimum; returns the new (A, b, c, basis0).
    The fresh slacks join the initial basis and never leave it (their column
    is zero in every structural column, so alpha is 0 there and theta = inf).
    """
    m, n = A.shape
    m_pad = (-m) % multiple
    if m_pad == 0:
        basis0 = np.arange(n - m, n, dtype=np.int32)
        return A, b, c, basis0
    A2 = np.zeros((m + m_pad, n + m_pad), A.dtype)
    A2[:m, :n] = A
    A2[m:, n:] = np.eye(m_pad, dtype=A.dtype)
    b2 = np.concatenate([b, np.ones(m_pad, b.dtype)])
    c2 = np.concatenate([c, np.zeros(m_pad, c.dtype)])
    basis0 = np.concatenate(
        [np.arange(n - m, n, dtype=np.int32), np.arange(n, n + m_pad, dtype=np.int32)]
    )
    return A2, b2, c2, basis0


class EqualityForm(NamedTuple):
    """Box-bounded equality form of a GeneralLP (the first-order entry
    format):  max c.x  s.t.  A x = b,  0 <= x <= u.

    ``recover`` maps the k2 TRANSFORMED structural variables (the first k2
    columns of A, before the slack block) back to the caller's original
    variables; ``z_const`` satisfies  z_original = z_transformed + z_const
    (nonzero when lower bounds were shifted / reflected / substituted)."""

    A: np.ndarray
    b: np.ndarray
    c: np.ndarray
    u: np.ndarray
    k_transformed: int  # structural (pre-slack) columns of A
    recover: object  # callable (k_transformed,) -> original (k,)
    z_const: float


def to_equality_form(lp) -> EqualityForm:
    """GeneralLP -> box-bounded equality form (see :class:`EqualityForm`).

    Handles the FULL bound vocabulary by the same shift / reflect / split
    rewriting as the two-phase route (``twophase._preprocess_bounds``):
    shifted lowers, finite uppers (kept as native box bounds), free-below
    columns (reflected), fully free columns (split into x+ - x-), and
    fixed columns (substituted out). L rows then gain a +slack column,
    G rows a -surplus column (both unbounded above), E rows nothing.
    This is the entry format of the first-order mode (``solve_pdhg`` with
    ``u=``), which needs no feasible basis and no artificials.

    Raises ``ValueError`` on a trivially infeasible bound pair (lo > up).
    """
    from simplex_tpu.core.twophase import GeneralLP, _preprocess_bounds

    if not isinstance(lp, GeneralLP):
        lp = GeneralLP(*lp)
    lp2, recover, z_const = _preprocess_bounds(lp)
    if lp2 is None:
        raise ValueError("infeasible bounds: some lower exceeds its upper")
    from simplex_tpu.core.twophase import _issparse

    sparse = _issparse(lp2.A)
    if sparse:
        import scipy.sparse as sps

        A = lp2.A.tocsc().astype(np.float64)
    else:
        A = np.asarray(lp2.A, np.float64)
    b = np.asarray(lp2.b, np.float64)
    c = np.asarray(lp2.c, np.float64)
    m, k2 = A.shape
    upper = (
        np.full(k2, np.inf)
        if lp2.upper is None
        else np.asarray(lp2.upper, np.float64)
    )
    types = [t.upper() for t in lp2.row_types]
    aug = [i for i, t in enumerate(types) if t in ("L", "G")]
    if sparse:
        S = sps.coo_matrix(
            (
                [1.0 if types[i] == "L" else -1.0 for i in aug],
                (aug, list(range(len(aug)))),
            ),
            shape=(m, len(aug)),
            dtype=np.float64,
        )
        A_eq = sps.hstack([A, S], format="csc")
    else:
        S = np.zeros((m, len(aug)))
        for j, i in enumerate(aug):
            S[i, j] = 1.0 if types[i] == "L" else -1.0
        A_eq = np.concatenate([A, S], axis=1)
    c_eq = np.concatenate([c, np.zeros(len(aug))])
    u_eq = np.concatenate([upper, np.full(len(aug), np.inf)])
    return EqualityForm(
        A=A_eq, b=b, c=c_eq, u=u_eq, k_transformed=k2, recover=recover,
        z_const=float(z_const),
    )
