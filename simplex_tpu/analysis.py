"""Post-solve sensitivity analysis (RHS and cost ranging).

Classic LP post-optimality, absent from the reference: over what range can
a right-hand side b_i or an objective coefficient c_j move before the
optimal BASIS changes — and how does the optimum move inside that range
(rate y_i for b_i; rate x_j for c_j of a basic column).

Everything is derived from the final basis on device (one Newton-Schulz
re-inversion, pure GEMMs on the MXU — the same machinery as
refactorization) and pulled as O(m + n) vectors; no m x m transfer.

    max c.x  s.t.  A x = b, x >= 0,  optimal basis B:
      RHS ranging    x_b(t)  = x_b + t * B_inv[:, i]  must stay >= 0
      cost ranging   nonbasic j: reduced cost d_j = c_j - y.A_j <= 0
                     must stay nonpositive -> c_j may rise by -d_j
                     basic j (row r): d_k(t) = d_k - t * (B_inv[r] A)_k
                     must stay <= 0 over all nonbasic k
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

_EXACT = jax.lax.Precision.HIGHEST


class RangingResult(NamedTuple):
    """Allowable DELTAS (not absolute values), per row / per column.

    ``b_lo[i] <= delta_b_i <= b_hi[i]`` keeps the basis optimal; within the
    range the optimum moves at rate ``y[i]`` per unit of b_i. Same shape
    for costs: ``c_lo[j] <= delta_c_j <= c_hi[j]``, with the optimum moving
    at rate ``x[j]`` (nonzero only for basic columns).
    """

    b_lo: np.ndarray  # (m,)
    b_hi: np.ndarray  # (m,)
    c_lo: np.ndarray  # (n,)
    c_hi: np.ndarray  # (n,)
    y: np.ndarray  # (m,) duals (dz/db)
    x: np.ndarray  # (n,) primal (dz/dc)
    # True when the basis re-inversion converged (device Newton-Schulz, or
    # the exact f64 host fallback it escalates to). False only when even the
    # f64 LU failed (numerically singular basis) — ranges are then garbage.
    ok: bool = True


@functools.partial(jax.jit, static_argnames=())
def _ranging_jit(A, b, c, basis, B_inv):
    dtype = A.dtype
    m, n = A.shape
    x_b = jnp.matmul(B_inv, b, precision=_EXACT)
    c_b = jnp.take(c, basis)
    y = jnp.matmul(c_b, B_inv, precision=_EXACT)
    red = jnp.matmul(y, A, precision=_EXACT) - c  # -reduced cost; >= 0 opt
    inf = jnp.asarray(jnp.inf, dtype)
    eps = jnp.asarray(1e-12, dtype)

    # ---- RHS ranging: x_b + t B_inv[:, i] >= 0 per column i of B_inv ----
    D = B_inv  # (m, m): column i is dx_b/db_i
    ratio = -x_b[:, None] / jnp.where(jnp.abs(D) > eps, D, inf)  # (m rows, i)
    pos = D > eps
    neg = D < -eps
    b_lo = jnp.max(jnp.where(pos, ratio, -inf), axis=0)
    b_hi = jnp.min(jnp.where(neg, ratio, inf), axis=0)

    # ---- cost ranging ----
    is_basic = jnp.zeros(n, bool).at[basis].set(True)
    # nonbasic j: c_j may rise until red_j = y.A_j - c_j hits 0, fall freely
    c_lo_nb = jnp.full(n, -jnp.inf, dtype)
    c_hi_nb = red  # >= 0 at optimality
    # basic j in basis row r: raising c_j by t shifts the duals by
    # y(t) = y + t e_r B_inv, so red_k(t) = red_k + t w_k with
    # w = B_inv[r] @ A; red_k(t) >= 0 must be preserved over nonbasic k:
    #   w_k > 0  ->  t >= -red_k / w_k   (lower bounds)
    #   w_k < 0  ->  t <= -red_k / w_k   (upper bounds)
    # (a first draft had the signs swapped — the returned range was the
    # negation of the true one; pinned by tests against brute-force scans)
    W = jnp.matmul(B_inv, A, precision=_EXACT)  # (m, n): row r is w
    mask_nb = ~is_basic[None, :]
    up_rows = jnp.min(
        jnp.where(
            jnp.logical_and(mask_nb, W < -eps), -red[None, :] / W, inf
        ),
        axis=1,
    )  # (m,)
    lo_rows = jnp.max(
        jnp.where(
            jnp.logical_and(mask_nb, W > eps), -red[None, :] / W, -inf
        ),
        axis=1,
    )
    c_lo = c_lo_nb.at[basis].set(lo_rows)
    c_hi = c_hi_nb.at[basis].set(up_rows)

    x = jnp.zeros(n, dtype).at[basis].set(x_b)
    return b_lo, b_hi, c_lo, c_hi, y, x


@functools.partial(jax.jit, static_argnames=("chunk",))
def _ranging_jit_sparse(A, b, c, basis, B_inv, chunk: int = 512):
    """Sparse twin of :func:`_ranging_jit`: never materializes the (m, n)
    tableau W = B_inv @ A — the cost-ranging reductions stream over
    ``chunk``-wide column blocks (gather + one (m,m)x(m,chunk) GEMM each),
    keeping peak extra memory at m*chunk. Padding duplicates column 0,
    which cannot perturb a min/max reduction."""
    from simplex_tpu import sparse as _bsp

    dtype = jnp.float32
    m, n = A.shape
    x_b = jnp.matmul(B_inv, b, precision=_EXACT)
    c_b = jnp.take(c, basis)
    y = jnp.matmul(c_b, B_inv, precision=_EXACT)
    red = _bsp.rmatvec(A, y).astype(dtype) - c
    inf = jnp.asarray(jnp.inf, dtype)
    eps = jnp.asarray(1e-12, dtype)

    D = B_inv
    ratio = -x_b[:, None] / jnp.where(jnp.abs(D) > eps, D, inf)
    b_lo = jnp.max(jnp.where(D > eps, ratio, -inf), axis=0)
    b_hi = jnp.min(jnp.where(D < -eps, ratio, inf), axis=0)

    is_basic = jnp.zeros(n, bool).at[basis].set(True)
    c_lo_nb = jnp.full(n, -jnp.inf, dtype)
    c_hi_nb = red

    nch = -(-n // chunk)
    idx = jnp.pad(jnp.arange(n, dtype=jnp.int32), (0, nch * chunk - n))

    def one(ids):
        cols = _bsp.gather_columns(A, ids).astype(dtype)  # (m, chunk)
        Wc = jnp.matmul(B_inv, cols, precision=_EXACT)
        redc = jnp.take(red, ids)[None, :]
        mask = ~jnp.take(is_basic, ids)[None, :]
        up = jnp.min(
            jnp.where(jnp.logical_and(mask, Wc < -eps), -redc / Wc, inf),
            axis=1,
        )
        lo = jnp.max(
            jnp.where(jnp.logical_and(mask, Wc > eps), -redc / Wc, -inf),
            axis=1,
        )
        return up, lo

    ups, los = jax.lax.map(one, idx.reshape(nch, chunk))  # (nch, m)
    up_rows = jnp.min(ups, axis=0)
    lo_rows = jnp.max(los, axis=0)
    c_lo = c_lo_nb.at[basis].set(lo_rows)
    c_hi = c_hi_nb.at[basis].set(up_rows)
    x = jnp.zeros(n, dtype).at[basis].set(x_b)
    return b_lo, b_hi, c_lo, c_hi, y, x


def ranging(A, b, c, basis) -> RangingResult:
    """Sensitivity ranges for the optimal ``basis`` (from SolveResult.basis).

    Deltas keeping the basis optimal; see :class:`RangingResult`. Degenerate
    optima can make ranges one-sided zeros (textbook behavior).

    The basis is re-inverted by device Newton-Schulz (pure MXU GEMMs, same
    machinery as the solver's refactorization) and the residual is CHECKED:
    an ill-conditioned basis that stalls the fp32 iteration falls back to an
    exact float64 host inversion (only O(m + n) vectors cross back either
    way), so the ranges are never silently derived from a bad inverse —
    mirroring the solver's own polish fallback (round-2 advisor finding).
    """
    from simplex_tpu import sparse as _bsp
    from simplex_tpu.core.linalg import inverse_newton
    from simplex_tpu.kernels import xla as _xk

    A_host_ref = A  # pre-conversion handle for the f64 host fallback
    is_sparse = isinstance(A, _bsp.BlockSparse)
    if not is_sparse:
        import scipy.sparse as _sps

        if _sps.issparse(A):
            A = _bsp.from_scipy(A, dtype=jnp.float32)
            is_sparse = True
    if not is_sparse:
        A = jnp.asarray(A, jnp.float32)
    else:
        A = A.astype(jnp.float32)
    basis_j = jnp.asarray(basis, jnp.int32)
    B = _xk.gather_basis_matrix(A, basis_j)
    B_inv, resid = inverse_newton(B)
    m = int(B.shape[0])
    ok = bool(np.isfinite(float(resid)) and float(resid) <= 1e-3)
    if not ok:
        from simplex_tpu.core.solver import _host_basis_cols
        from simplex_tpu.logging import get_logger

        get_logger("analysis").warning(
            "ranging: Newton-Schulz re-inversion stalled (residual %g); "
            "falling back to exact f64 host inversion", float(resid)
        )
        AB = _host_basis_cols(A_host_ref, np.asarray(basis, np.int64))
        if not isinstance(AB, np.ndarray):
            AB = AB.toarray()
        try:
            B_inv64 = np.linalg.inv(np.asarray(AB, np.float64))
            B_inv = jnp.asarray(B_inv64.astype(np.float32))
            ok = True
        except np.linalg.LinAlgError:
            ok = False  # singular basis: report, don't raise
    rang = _ranging_jit_sparse if is_sparse else _ranging_jit
    out = rang(
        A, jnp.asarray(b, jnp.float32), jnp.asarray(c, jnp.float32),
        basis_j, B_inv,
    )
    b_lo, b_hi, c_lo, c_hi, y, x = jax.device_get(out)
    return RangingResult(
        b_lo=np.asarray(b_lo), b_hi=np.asarray(b_hi),
        c_lo=np.asarray(c_lo), c_hi=np.asarray(c_hi),
        y=np.asarray(y), x=np.asarray(x), ok=ok,
    )


def reoptimize(
    A,
    b_new,
    c,
    prev,
    *,
    u=None,
    options=None,
):
    """Re-solve after a RHS change, warm-started from a prior optimal basis.

    ``prev`` is the :class:`~simplex_tpu.core.solver.SolveResult` of the
    original solve (its ``basis`` is dual-feasible for ANY b — reduced-cost
    signs depend only on A and c). Pairs with :func:`ranging`: a delta-b
    inside the allowable range keeps the same basis (the dual loop exits in
    0 pivots and only the values are re-derived); outside it, the dual
    simplex pivots to the new optimal basis in far fewer steps than a cold
    phase-1 + phase-2 run (see tests/test_dual.py for measured counts).

    For a COST change use the primal warm start instead —
    ``solve(A, b, c_new, basis0=prev.basis)`` (the old basis stays
    primal-feasible when only c moved).
    """
    from simplex_tpu.config import DEFAULT_OPTIONS
    from simplex_tpu.core.dual import solve_dual

    return solve_dual(
        A,
        b_new,
        c,
        basis0=prev.basis,
        u=u,
        at_upper0=getattr(prev, "at_upper", None),
        options=options if options is not None else DEFAULT_OPTIONS,
    )
