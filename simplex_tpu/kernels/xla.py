"""Pure-XLA (jnp) implementations of the hot solver ops.

This is the default backend: each op is ordinary jnp traced under ``jit``,
letting XLA fuse and tile onto the MXU/VPU. The Pallas backend
(:mod:`simplex_tpu.kernels.pallas_ops`) provides hand-written TPU kernels
behind the same signatures; :mod:`simplex_tpu.kernels.dispatch` selects.

Reference op mapping (see SURVEY.md §2):
  choose_entering  <- pricing GEMM + CUB ArgMin (src/v4_cub_reduction.cu:289-302)
  ratio_argmin     <- compute_theta kernel + CUB ArgMin (:313-325)
  rank1_update     <- compute_E_q + cublasSger (:331-333)
  gather_column    <- `d_A + p * m` column pointer arithmetic (:307-308)
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def reduced_costs(y: jnp.ndarray, A: jnp.ndarray, c: jnp.ndarray) -> jnp.ndarray:
    """e_j = y . A_j - c_j  (the reference's ``e = [1 y] @ [-c; A]``).

    The reference materializes the augmented matrix ``D = [-c; A]`` purely to
    fuse two GEMMs (``src/v4_cub_reduction.cu:278-290``); under XLA the
    subtraction fuses into the matvec epilogue for free, so we skip D.

    ``A`` may be the bf16 pricing shadow (``Problem.A_price``): the dot then
    runs with bf16 operands but accumulates in ``c``'s dtype (f32), and the
    subtraction of ``c`` stays in f32. It may also be a
    :class:`simplex_tpu.sparse.BlockSparse` shadow
    (``SimplexOptions.pricing_sparse``): the pass then reads only the
    stored tiles — same exact-recheck contract either way.
    """
    from simplex_tpu import sparse as _bsp

    if isinstance(A, _bsp.BlockSparse):
        return _bsp.rmatvec(A, y).astype(c.dtype) - c
    acc = jnp.promote_types(c.dtype, jnp.float32)
    e = jax.lax.dot_general(
        y.astype(A.dtype), A, (((0,), (0,)), ((), ())), preferred_element_type=acc
    )
    return e.astype(c.dtype) - c


def choose_entering(
    y: jnp.ndarray,
    A: jnp.ndarray,
    c: jnp.ndarray,
    eps: float,
    use_bland: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Pick the entering column. Returns ``(p, min_e)``.

    Dantzig rule: global argmin of reduced costs (deterministic lowest-index
    tie-break, unlike the reference's atomicCAS race —
    ``src/v1_baseline.cu:211-217``). Bland rule (anti-cycling fallback):
    smallest index j with ``e_j < -eps``.

    Optimality is ``min_e >= -eps`` under either rule (if no e_j < -eps,
    Bland also terminates), so callers test min_e regardless of p.
    """
    e = reduced_costs(y, A, c)
    p_dantzig = jnp.argmin(e)
    neg = e < -eps
    # argmax of a boolean vector = first True (all-False -> 0, but then the
    # caller's optimality test fires first).
    p_bland = jnp.argmax(neg)
    p = jnp.where(use_bland, p_bland, p_dantzig)
    return p.astype(jnp.int32), jnp.min(e)


BASIC_PENALTY = 1e30


def mask_basic(c: jnp.ndarray, basis: jnp.ndarray) -> jnp.ndarray:
    """Price-mask the basic columns: c_eff = c - 1e30 at basis positions, so
    their effective reduced cost e + 1e30 can never win the argmin.

    In exact arithmetic a basic column's reduced cost is 0 and Dantzig never
    re-selects it; under fp32 drift it can read below -eps, and re-entering
    a basic column makes the basis SINGULAR (observed at 16384x32768: a
    duplicated basis column after ~16k pivots poisoned the checkpoint).
    Masking also sharpens termination: min_e becomes the minimum over
    NONBASIC columns, which is the actual optimality criterion."""
    return c.at[basis].add(-BASIC_PENALTY)


def gather_column(A: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
    """A[:, p] via dynamic slice (stays on device under jit).

    ``A`` may be a :class:`simplex_tpu.sparse.BlockSparse` (the fully sparse
    solve path, where dense A never materializes on device): the gather then
    dynamic-slices one in-tile column out of every stored tile and
    segment-sums — stored-bytes/bc traffic instead of O(m)."""
    from simplex_tpu import sparse as _bsp

    if isinstance(A, _bsp.BlockSparse):
        return _bsp.gather_column(A, p)
    return jax.lax.dynamic_index_in_dim(A, p, axis=1, keepdims=False)


def gather_columns(A, idx) -> jnp.ndarray:
    """A[:, idx] with a static-length index vector (multiple-pricing refill)."""
    from simplex_tpu import sparse as _bsp

    if isinstance(A, _bsp.BlockSparse):
        return _bsp.gather_columns(A, idx)
    return jnp.take(A, idx, axis=1)


def matvec(A, x) -> jnp.ndarray:
    """A @ x at exact precision, dense or BlockSparse (effective-rhs path)."""
    from simplex_tpu import sparse as _bsp

    if isinstance(A, _bsp.BlockSparse):
        return _bsp.matvec(A, x.astype(A.dtype)).astype(x.dtype)
    return jnp.matmul(
        A.astype(x.dtype), x, precision=jax.lax.Precision.HIGHEST
    )


def devex_choose(
    e: jnp.ndarray, gamma: jnp.ndarray, eps: float, use_bland: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Entering choice from maintained reduced costs with Devex weights.

    Maximizes e_j^2 / gamma_j over eligible columns (e_j < -eps) — the Devex
    approximation of the steepest-edge criterion. Returns (p, min_e); min_e
    drives the (incremental) optimality test.
    """
    neg = e < -eps
    score = jnp.where(neg, (e * e) / gamma, -jnp.inf)
    p_devex = jnp.argmax(score)
    p_bland = jnp.argmax(neg)
    p = jnp.where(use_bland, p_bland, p_devex)
    return p.astype(jnp.int32), jnp.min(e)


def devex_choose_bounded(
    e: jnp.ndarray,
    gamma: jnp.ndarray,
    at_upper: jnp.ndarray,
    eps: float,
    use_bland: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """:func:`devex_choose` under the bounded-variable rule.

    Eligibility flips sign for nonbasic-at-upper columns (they improve by
    DEcreasing): ``s_j = at_upper ? -e_j : e_j``, eligible when
    ``s_j < -eps``. The score ``e^2/gamma`` is sign-free, so the weights
    themselves need no bound awareness — only the eligibility mask and the
    returned termination value ``min s`` do. Basic columns are not masked
    (their maintained e is ~0); a drifted basic pick is caught by the
    caller's exact staleness recheck, exactly as in the unbounded rule.
    """
    s = jnp.where(at_upper, -e, e)
    neg = s < -eps
    score = jnp.where(neg, (e * e) / gamma, -jnp.inf)
    p_devex = jnp.argmax(score)
    p_bland = jnp.argmax(neg)
    p = jnp.where(use_bland, p_bland, p_devex)
    return p.astype(jnp.int32), jnp.min(s)


def choose_entering_bounded(
    y: jnp.ndarray,
    A: jnp.ndarray,
    c: jnp.ndarray,
    at_upper: jnp.ndarray,
    basis: jnp.ndarray,
    base_col: jnp.ndarray,
    eps: float,
    use_bland: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Entering choice under the bounded-variable rule. Returns ``(p, min_s)``.

    A nonbasic-at-LOWER column improves by increasing (needs ``e_j < -eps``);
    a nonbasic-at-UPPER column improves by decreasing (needs ``e_j > +eps``).
    Both collapse to one signed criterion ``s_j = at_upper ? -e_j : e_j`` with
    the usual ``min s >= -eps`` optimality test. Basic columns are masked to
    ``+BASIC_PENALTY`` AFTER the sign flip (the ``mask_basic`` c-trick would
    flip the penalty's sign for at-upper columns).

    ``A``/``c``/``at_upper`` may be a column segment starting at global index
    ``base_col`` (segmented pricing); ``basis`` stays global and is mapped
    into the segment for the masking scatter. ``p`` is returned LOCAL to the
    segment (callers add ``base_col``).
    """
    e = reduced_costs(y, A, c)
    s = jnp.where(at_upper, -e, e)
    w = s.shape[0]
    loc = jnp.clip(basis - base_col, 0, w - 1)
    in_seg = jnp.logical_and(basis >= base_col, basis < base_col + w)
    s = s.at[loc].add(jnp.where(in_seg, jnp.asarray(BASIC_PENALTY, s.dtype), 0))
    p_dantzig = jnp.argmin(s)
    neg = s < -eps
    p_bland = jnp.argmax(neg)
    p = jnp.where(use_bland, p_bland, p_dantzig)
    return p.astype(jnp.int32), jnp.min(s)


def ratio_argmin_bounded(
    x_b: jnp.ndarray,
    d: jnp.ndarray,
    u_basic: jnp.ndarray,
    u_p: jnp.ndarray,
    basis: jnp.ndarray,
    pivot_tol: float,
    use_bland: jnp.ndarray,
    harris: bool,
    feas_tol: float,
):
    """Two-sided (bounded-variable) ratio test.

    ``d = sigma * alpha`` is the rate at which each basic value DEcreases per
    unit step of the entering variable (``sigma`` = +1 entering from lower,
    -1 from upper). Three ways a step can be blocked:

      * a basic variable hits its LOWER bound 0:      d_i > tol
      * a basic variable hits its (finite) UPPER u_i: d_i < -tol
      * the entering variable hits its own opposite bound: t = u_p
        (the bound-FLIP outcome — no basis change at all)

    Returns ``(q, theta, unbounded, flip, leave_upper)``: ``flip`` means the
    entering column just flips bound (q/leave_upper meaningless); otherwise
    ``leave_upper`` says the leaving variable exits at its upper bound.
    Unbounded iff no row blocks and ``u_p`` is infinite.

    ``harris=True`` applies the same two-pass stabilization as
    :func:`ratio_argmin_harris`, with BOTH bounds relaxed by ``feas_tol`` in
    pass 1 and the largest ``|d|`` picked among rows whose true ratio fits
    the relaxed bound.
    """
    inf = jnp.asarray(jnp.inf, x_b.dtype)
    one = jnp.asarray(1, x_b.dtype)
    dec = d > pivot_tol
    inc = jnp.logical_and(d < -pivot_tol, jnp.isfinite(u_basic))
    x_pos = jnp.maximum(x_b, 0)
    # headroom to the upper bound, clamped at 0 like x_pos (Harris drift)
    gap_pos = jnp.maximum(u_basic - x_b, 0)
    safe_dec = jnp.where(dec, d, one)
    safe_inc = jnp.where(inc, -d, one)
    theta_dec = jnp.where(dec, x_pos / safe_dec, inf)
    theta_inc = jnp.where(inc, gap_pos / safe_inc, inf)
    theta_row = jnp.minimum(theta_dec, theta_inc)
    any_row = jnp.any(jnp.logical_or(dec, inc))
    unbounded = jnp.logical_and(~any_row, ~jnp.isfinite(u_p))

    if harris:
        rel_dec = jnp.where(dec, (x_pos + feas_tol) / safe_dec, inf)
        rel_inc = jnp.where(inc, (gap_pos + feas_tol) / safe_inc, inf)
        theta_max = jnp.min(jnp.minimum(rel_dec, rel_inc))
        ok = jnp.logical_and(
            jnp.logical_or(dec, inc), theta_row <= theta_max
        )
        q_harris = jnp.argmax(jnp.where(ok, jnp.abs(d), -inf))
    else:
        theta_max = jnp.min(theta_row)
        q_harris = jnp.argmin(theta_row)

    # Bland: exact smallest ratio, smallest basis index among exact ties
    # (see ratio_argmin for why the tie set must be exact equality).
    tmin = jnp.min(theta_row)
    tie = theta_row == tmin
    big = jnp.iinfo(jnp.int32).max
    q_bland = jnp.argmin(jnp.where(tie, basis, big))
    q = jnp.where(use_bland, q_bland, q_harris).astype(jnp.int32)
    theta_q = jnp.where(use_bland, tmin, theta_row[q])

    # the entering variable's own traverse to its other bound competes with
    # the row minimum; prefer the flip on ties (no basis change, and the
    # Harris pass-1 bound also admits it when u_p <= theta_max)
    row_bound = jnp.where(use_bland, tmin, jnp.where(harris, theta_max, tmin))
    flip = jnp.logical_and(~unbounded, u_p <= row_bound)
    theta = jnp.where(flip, u_p, jnp.where(any_row, theta_q, inf))
    leave_upper = theta_inc[q] < theta_dec[q]
    return q, theta, unbounded, flip, leave_upper


def pricing_update(A: jnp.ndarray, rho: jnp.ndarray) -> jnp.ndarray:
    """w = rho . A — the updated pivot row of the tableau (one O(mn) pass,
    replacing the Dantzig y.A pricing pass at identical HBM traffic). Feeds
    both the incremental reduced-cost update (e -= e_p * w) and the Devex
    weight update (gamma = max(gamma, w^2 * gamma_p)).

    Runs at full f32 precision (Precision.HIGHEST): w feeds the *incremental*
    reduced costs, whose errors accumulate over pivots — on the TPU MXU the
    default f32 matmul is single-pass bf16, and that noise compounds into
    divergent pivot choices (observed at 8k x 16k on v5e). HIGHEST costs only
    extra MXU passes over the same HBM bytes; the pass stays HBM-bound."""
    from simplex_tpu import sparse as _bsp

    if isinstance(A, _bsp.BlockSparse):
        return _bsp.rmatvec(A, rho.astype(A.dtype)).astype(rho.dtype)
    return jnp.matmul(rho, A.astype(rho.dtype), precision=jax.lax.Precision.HIGHEST)


def pricing_update2(A: jnp.ndarray, rho: jnp.ndarray, u: jnp.ndarray):
    """``(rho . A, u . A)`` in ONE pass over A.

    Steepest-edge pricing needs two O(mn) row-vector passes per pivot: the
    tableau pivot row ``w = rho . A`` (reduced-cost update) and
    ``v = u . A`` with ``u = B^{-T} alpha`` (the Goldfarb-Reid weight
    recurrence's ``t_j . alpha`` terms). Issued as two GEMVs, XLA streams A
    from HBM twice; stacked as one (2, m) x (m, n) GEMM it reads A once —
    the pass is HBM-bound, so this halves steepest-edge's dominant
    per-pivot cost. Same HIGHEST-precision rationale as
    :func:`pricing_update` (both outputs feed incremental state).

    BlockSparse A falls back to two tile passes (the tile rmatvec is
    vector-only; sparse reads are already tile-bound, not O(mn))."""
    from simplex_tpu import sparse as _bsp

    if isinstance(A, _bsp.BlockSparse):
        return pricing_update(A, rho), pricing_update(A, u)
    wv = jnp.matmul(
        jnp.stack([rho, u]), A.astype(rho.dtype),
        precision=jax.lax.Precision.HIGHEST,
    )
    return wv[0], wv[1]


def gather_cost(c: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
    """c[p] as a traced scalar."""
    return jax.lax.dynamic_index_in_dim(c, p, axis=0, keepdims=False)


def gather_basis_matrix(A: jnp.ndarray, basis: jnp.ndarray) -> jnp.ndarray:
    """A[:, basis] — the true basis matrix, used by refactorization."""
    from simplex_tpu import sparse as _bsp

    if isinstance(A, _bsp.BlockSparse):
        return _bsp.gather_columns(A, basis)
    return jnp.take(A, basis, axis=1)


def ratio_argmin(
    x_b: jnp.ndarray,
    alpha: jnp.ndarray,
    basis: jnp.ndarray,
    pivot_tol: float,
    use_bland: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Masked ratio test. Returns ``(q, theta_q, unbounded)``.

    theta_j = x_b_j / alpha_j over eligible pivots (alpha_j > pivot_tol);
    q = argmin theta. The reference's ``compute_theta`` uses exact
    ``alpha > 0`` and counts non-positives with an atomicAdd for the
    unboundedness test (``src/v4_cub_reduction.cu:199-208``); here
    eligibility is a tolerance and unboundedness is ``~any(mask)`` — one
    fused reduction, no atomics.

    Under Bland's rule the tie-break among minimizing rows is the smallest
    *basis index* (required for the anti-cycling guarantee), implemented as a
    second masked argmin over basis indices.
    """
    mask = alpha > pivot_tol
    unbounded = ~jnp.any(mask)
    inf = jnp.asarray(jnp.inf, x_b.dtype)
    # max(x_b, 0): defensive clamp — fp drift can push a basic value a hair
    # negative, which would otherwise produce a negative theta and a wrong
    # pivot (reference README lists `x_b_t < 0` handling as an open TODO).
    theta = jnp.where(mask, jnp.maximum(x_b, 0) / jnp.where(mask, alpha, 1), inf)
    tmin = jnp.min(theta)
    q_plain = jnp.argmin(theta)
    # Bland tie-break: among rows attaining ~tmin, smallest basis index.
    # Bland's anti-cycling guarantee is proven for rows attaining the
    # EXACT minimum ratio; all theta here come from one expression, so exact
    # equality selects precisely the argmin tie set (a tolerance band could
    # admit a non-minimal row and break feasibility monotonicity).
    tie = theta == tmin
    big = jnp.iinfo(jnp.int32).max
    q_bland = jnp.argmin(jnp.where(tie, basis, big))
    q = jnp.where(use_bland, q_bland, q_plain).astype(jnp.int32)
    theta_q = jnp.where(unbounded, inf, tmin)
    return q, theta_q, unbounded


def ratio_argmin_harris(
    x_b: jnp.ndarray,
    alpha: jnp.ndarray,
    basis: jnp.ndarray,
    pivot_tol: float,
    use_bland: jnp.ndarray,
    feas_tol: float = 1e-6,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Harris two-pass stabilized ratio test. Same contract as
    :func:`ratio_argmin`.

    Pass 1 relaxes primal feasibility by ``feas_tol`` to get an upper bound
    ``theta_max = min (x_b_j + feas_tol) / alpha_j``; pass 2 picks, among
    rows whose true ratio is within the bound, the LARGEST pivot magnitude
    ``alpha_q``. The classic test's smallest-ratio row can have an
    arbitrarily tiny alpha_q, whose ``1/alpha_q`` blows up the product-form
    inverse in fp32 (the reference lists division-by-small-pivot as an open
    TODO, README.md:29); Harris bounds it at the cost of O(feas_tol) primal
    infeasibility, which the ratio test itself tolerates (it prices
    ``max(x_b, 0)``) and which is surfaced to the caller via
    ``SolveResult.feas_err`` rather than clamped away.

    Under Bland's anti-cycling rule, falls back to the classic smallest-
    basis-index tie-break (the Bland guarantee needs it).
    """
    mask = alpha > pivot_tol
    unbounded = ~jnp.any(mask)
    inf = jnp.asarray(jnp.inf, x_b.dtype)
    safe_alpha = jnp.where(mask, alpha, 1)
    x_pos = jnp.maximum(x_b, 0)
    # pass 1: relaxed bound
    theta_rel = jnp.where(mask, (x_pos + feas_tol) / safe_alpha, inf)
    theta_max = jnp.min(theta_rel)
    # pass 2: largest pivot among rows whose true ratio fits the bound
    theta = jnp.where(mask, x_pos / safe_alpha, inf)
    ok = jnp.logical_and(mask, theta <= theta_max)
    q_harris = jnp.argmax(jnp.where(ok, alpha, -inf))
    # classic + Bland path (exact smallest ratio, smallest basis index ties)
    tmin = jnp.min(theta)
    # Bland's anti-cycling guarantee is proven for rows attaining the
    # EXACT minimum ratio; all theta here come from one expression, so exact
    # equality selects precisely the argmin tie set (a tolerance band could
    # admit a non-minimal row and break feasibility monotonicity).
    tie = theta == tmin
    big = jnp.iinfo(jnp.int32).max
    q_bland = jnp.argmin(jnp.where(tie, basis, big))
    q = jnp.where(use_bland, q_bland, q_harris).astype(jnp.int32)
    theta_q = jnp.where(unbounded, inf, jnp.where(use_bland, tmin, theta[q]))
    return q, theta_q, unbounded


def rank1_update(
    B_inv: jnp.ndarray, eta: jnp.ndarray, binv_q: jnp.ndarray
) -> jnp.ndarray:
    """Product-form update ``B_inv += eta (x) binv_q`` (reference cublasSger,
    ``src/v4_cub_reduction.cu:333``). Pure outer-product add; XLA emits a
    single fused HBM-bandwidth-bound kernel."""
    return B_inv + eta[:, None] * binv_q[None, :]
