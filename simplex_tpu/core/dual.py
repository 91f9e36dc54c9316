"""Dual simplex: re-optimize from a dual-feasible basis after a RHS change.

The reference has no counterpart — this is "production serving" territory
(round-2 verdict next-step #7): after an optimal solve, a changed ``b``
leaves the old basis DUAL-feasible (reduced-cost signs depend only on A and
c) but possibly primal-infeasible. The dual simplex drives the primal
violations out in a handful of pivots instead of a fresh phase-1 + phase-2
run, which pairs with :mod:`simplex_tpu.analysis` ranging: inside the
allowable delta-b range the basis is simply re-priced (zero pivots); outside
it, :func:`solve_dual` walks to the new optimal basis.

One dual pivot (the mirror of core/step.pivot_step, same update algebra):

  leaving   r = argmax violation v_i, v_i = max(-x_b_i, x_b_i - u_i);
            primal feasible (terminate) iff max v <= feas_tol-scaled bound
  btran row w = B_inv[r] @ A   (one O(mn) pass, fused with the exact
            reduced costs e = y.A - c into a single (2, m) x (m, n) GEMM —
            the same HBM traffic as one primal pricing pass)
  ratio     sigma = +1 leaving at upper, -1 at lower;  g = sigma * w;
            eligible nonbasic j:  at-lower with g_j > tol  or  at-upper
            with g_j < -tol;  mu_j = d_j / |g_j|  with d_j the SIGNED
            reduced cost (>= 0 under dual feasibility);  entering
            p = argmin mu (Harris-stabilized: largest |g| within a
            dual-tolerance band), INFEASIBLE iff no column is eligible
            (dual unbounded => primal empty, Farkas from row r)
  update    identical product-form / x_b / y algebra as the primal step
            with q = r and theta = delta_r / alpha_r

Everything runs inside one jitted ``lax.while_loop`` (zero host syncs, like
the primal loop); :func:`solve_dual` then hands the primal-feasible state to
the primal loop in the SAME executable, so the returned result carries the
full OPTIMAL contract (verify_terminal, polish, feas_err, duals).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from simplex_tpu.config import DEFAULT_OPTIONS, SimplexOptions
from simplex_tpu.core.state import Problem, SolverState, initial_state, with_pricing_shadow
from simplex_tpu.core.step import refactorize
from simplex_tpu.kernels.dispatch import get_backend
from simplex_tpu.status import SolveStatus

_EXACT = jax.lax.Precision.HIGHEST


def _violations(state: SolverState, u_basic):
    """Per-row primal infeasibility v_i = max(-x_b_i, x_b_i - u_i)."""
    low = -state.x_b
    up = state.x_b - u_basic  # -inf rows never win (u = +inf)
    return jnp.maximum(low, up), up > low


def dual_pivot_step(
    prob: Problem,
    state: SolverState,
    opts: SimplexOptions,
    backend,
) -> SolverState:
    """One dual pivot (or a terminal status). Pure; jit-safe.

    Reads the state's eager ``B_inv`` only — the deferred-update / multiple-
    pricing buffers stay empty during the dual phase (they are primal-loop
    machinery; refactorize clears them at the phase switch anyway).
    """
    dtype = state.B_inv.dtype
    m, n = prob.A.shape
    eps_d = jnp.asarray(opts.resolve_eps(), dtype)
    bounded = prob.u is not None
    u_basic = (
        jnp.take(prob.u, state.basis).astype(dtype)
        if bounded
        else jnp.full((m,), jnp.inf, dtype)
    )
    at_up = (
        state.at_upper if bounded else jnp.zeros((n,), bool)
    )

    use_bland = jnp.logical_and(
        opts.bland_after > 0, state.degen >= opts.bland_after
    )

    # ---- leaving row: most-violating basic variable ----
    v, over_upper = _violations(state, u_basic)
    maxv = jnp.max(v)
    # relative exit test: Harris already tolerates O(feas_tol) absolute
    # infeasibility, and x_b's scale is the solve's own
    feas_bound = jnp.asarray(opts.feas_tol, dtype) * (
        1 + jnp.max(jnp.abs(state.x_b))
    )
    feasible = maxv <= feas_bound
    viol = v > feas_bound
    r_dantzig = jnp.argmax(v)
    # Bland-style anti-cycling: smallest BASIS INDEX among violating rows
    big = jnp.iinfo(jnp.int32).max
    r_bland = jnp.argmin(jnp.where(viol, state.basis, big))
    r = jnp.where(use_bland, r_bland, r_dantzig).astype(jnp.int32)
    sigma = jnp.where(over_upper[r], 1, -1).astype(dtype)

    # ---- btran row + exact reduced costs in ONE (2, m) x (m, n) GEMM ----
    binv_r = jax.lax.dynamic_index_in_dim(state.B_inv, r, axis=0, keepdims=False)
    from simplex_tpu import sparse as _bsp

    if isinstance(prob.A, _bsp.BlockSparse):
        # sparse A: two stored-tile passes instead of one fused dense GEMM
        # (same exact f32 accumulation; traffic = 2x tiles, not 2x dense)
        e = _bsp.rmatvec(prob.A, state.y).astype(dtype) - prob.c.astype(dtype)
        w = _bsp.rmatvec(prob.A, binv_r).astype(dtype)
    else:
        YW = jnp.matmul(
            jnp.stack([state.y, binv_r]), prob.A.astype(dtype), precision=_EXACT
        )
        e = YW[0] - prob.c.astype(dtype)
        w = YW[1]

    # ---- dual ratio test over nonbasic columns ----
    is_basic = jnp.zeros((n,), bool).at[state.basis].set(True)
    g = sigma * w
    elig = jnp.logical_and(
        ~is_basic,
        jnp.where(at_up, g < -opts.pivot_tol, g > opts.pivot_tol),
    )
    if bounded:
        # FIXED columns (u_j == 0, e.g. artificials pinned out of a warm
        # general-form re-solve) place no constraint on the duals — their
        # reduced cost may take any sign — so they are never eligible.
        # Excluding them keeps the no-eligible => INFEASIBLE conclusion a
        # true Farkas statement over the real columns.
        elig = jnp.logical_and(elig, prob.u > 0)
    d_pos = jnp.maximum(jnp.where(at_up, -e, e), 0)  # clamp dual drift
    absg = jnp.abs(g)
    safe_g = jnp.where(elig, absg, 1)
    inf_ = jnp.asarray(jnp.inf, dtype)
    mu_all = jnp.where(elig, d_pos / safe_g, inf_)
    # Bland: smallest eligible column index attaining the exact min ratio
    mu_min = jnp.min(mu_all)
    tie = mu_all == mu_min
    p_bland = jnp.argmax(jnp.logical_and(tie, elig))

    long_step = bounded and opts.dual_flip
    if long_step:
        # Bound-flipping ratio test (BFRT, the dual "long step"): walk the
        # breakpoints mu_j in ascending order; passing a FINITE-bound
        # column flips it to its other bound (no basis change) and reduces
        # the dual-objective slope from |delta_r| by u_j |g_j|; the column
        # where the slope would go nonpositive — or the first unbounded-
        # column breakpoint (weight +inf) — enters. If the slope survives
        # every eligible breakpoint, the dual is unbounded along this row
        # even WITH all flips applied: primal INFEASIBLE.
        slope0 = v[r]
        u_all = prob.u.astype(dtype)
        finite_u = jnp.isfinite(u_all)
        u_safe = jnp.where(finite_u, u_all, 1)  # keep inf out of the product
        weight = jnp.where(
            elig, jnp.where(finite_u, u_safe * absg, inf_), 0
        )
        order = jnp.argsort(mu_all)  # eligible first (ineligible mu = inf)
        csum = jnp.cumsum(weight[order])
        crossed = csum >= slope0
        found = jnp.any(crossed)
        sel_k = jnp.argmax(crossed)
        p_flip = order[sel_k].astype(jnp.int32)
        flip_sorted = jnp.arange(n) < sel_k
        flip_raw = (
            jnp.zeros((n,), bool).at[order].set(flip_sorted)
        )
        flip_raw = jnp.logical_and(jnp.logical_and(flip_raw, elig), finite_u)
        infeasible = jnp.logical_and(
            ~feasible,
            jnp.where(use_bland, ~jnp.any(elig), ~found),
        )
        p = jnp.where(use_bland, p_bland, p_flip).astype(jnp.int32)
        mu = mu_all[p]
    else:
        infeasible = jnp.logical_and(~feasible, ~jnp.any(elig))
        # Harris-stabilized single-break test: pass 1 relaxes dual
        # feasibility by eps_d, pass 2 picks the largest |g| (most stable
        # pivot) within the relaxed bound
        mu_rel = jnp.where(elig, (d_pos + eps_d) / safe_g, inf_)
        mu_max = jnp.min(mu_rel)
        ok = jnp.logical_and(elig, mu_all <= mu_max)
        p_harris = jnp.argmax(jnp.where(ok, absg, -inf_))
        p = jnp.where(use_bland, p_bland, p_harris).astype(jnp.int32)
        mu = jnp.where(use_bland, mu_min, mu_all[p])

    # ---- ftran + primal step ----
    A_p = backend.gather_column(prob.A, p).astype(dtype)
    alpha = state.B_inv @ A_p
    alpha_r = alpha[r]
    take = jnp.logical_and(~feasible, ~infeasible)
    # numerical guard: the represented alpha_r must agree with the pivot
    # row's w_p in sign and magnitude; a vanishing alpha_r explodes 1/alpha_r
    bad = jnp.logical_and(take, jnp.abs(alpha_r) <= opts.pivot_tol)
    take = jnp.logical_and(take, ~bad)

    safe_ar = jnp.where(take, alpha_r, jnp.asarray(1, dtype))
    inv_ar = jnp.asarray(1, dtype) / safe_ar

    if long_step:
        # apply the bound flips the walk passed: x_b absorbs A @ dxN via
        # one O(mn) + O(m^2) pass, skipped entirely when nothing flipped
        flip_mask = jnp.logical_and(
            flip_raw, jnp.logical_and(take, ~use_bland)
        )
        dxN = jnp.where(
            flip_mask,
            jnp.where(at_up, -u_safe, u_safe),
            jnp.asarray(0, dtype),
        ).astype(dtype)

        def _apply_flips(xb):
            from simplex_tpu.kernels import xla as _xk

            return xb - state.B_inv @ _xk.matvec(prob.A, dxN)

        x_b_base = jax.lax.cond(
            jnp.any(flip_mask), _apply_flips, lambda xb: xb, state.x_b
        )
    else:
        flip_mask = jnp.zeros((n,), bool)
        x_b_base = state.x_b

    bound_r = jnp.where(sigma > 0, u_basic[r], jnp.asarray(0, dtype))
    delta_r = x_b_base[r] - bound_r
    t = jnp.where(take, delta_r * inv_ar, jnp.asarray(0, dtype))

    u_p = (
        backend.gather_cost(prob.u, p).astype(dtype)
        if bounded
        else jnp.asarray(jnp.inf, dtype)
    )
    # the entering column's CURRENT bound value (after any flip it itself
    # did NOT take — p is the crossing breakpoint, never in flip_mask)
    v_p = jnp.where(at_up[p], u_p, jnp.asarray(0, dtype))
    x_b_new = (x_b_base - t * alpha).at[r].set(v_p + t)

    # ---- product-form update (identical algebra to the primal step) ----
    eta = (-alpha * inv_ar).at[r].set(inv_ar - 1)
    B_inv_new = backend.rank1_update(state.B_inv, eta, binv_r)
    e_p = e[p]
    y_new = state.y - (e_p * inv_ar) * binv_r
    c_p = backend.gather_cost(prob.c, p).astype(dtype)
    c_b_new = state.c_b.at[r].set(c_p)
    lv = state.basis[r]
    basis_new = state.basis.at[r].set(p)
    if bounded:
        au = jnp.logical_xor(state.at_upper, flip_mask)  # long-step flips
        at_upper_new = au.at[p].set(False).at[lv].set(sigma > 0)
    else:
        at_upper_new = None

    degen_new = jnp.where(
        mu <= jnp.asarray(opts.degen_tol, dtype), state.degen + 1, jnp.int32(0)
    )
    status_new = jnp.where(
        feasible,
        jnp.int32(SolveStatus.OPTIMAL),  # primal feasible: dual loop done
        jnp.where(
            infeasible,
            jnp.int32(SolveStatus.INFEASIBLE),
            jnp.where(
                bad,
                jnp.int32(SolveStatus.SINGULAR),
                jnp.int32(SolveStatus.RUNNING),
            ),
        ),
    )

    def sel(new, old):
        return jnp.where(take, new, old)

    return state._replace(
        B_inv=sel(B_inv_new, state.B_inv),
        x_b=sel(x_b_new, state.x_b),
        y=sel(y_new, state.y),
        c_b=sel(c_b_new, state.c_b),
        basis=sel(basis_new, state.basis),
        iters=state.iters + jnp.where(take, jnp.int32(1), jnp.int32(0)),
        status=status_new,
        degen=jnp.where(take, degen_new, state.degen),
        at_upper=(
            jnp.where(take, at_upper_new, state.at_upper) if bounded else None
        ),
    )


def dual_solve_state(
    prob: Problem,
    state0: SolverState,
    opts: SimplexOptions,
    max_iter,
    backend=None,
) -> SolverState:
    """Run the dual pivot loop until primal feasibility (status OPTIMAL),
    INFEASIBLE, SINGULAR, or budget exhaustion. Traced; jit-safe.

    Terminal decisions made from a stale product-form inverse are re-checked
    from an exact one (same verify pattern as the primal
    :func:`~simplex_tpu.core.solver.solve_state`)."""
    if backend is None:
        backend = get_backend(opts.backend)

    def cond(s: SolverState):
        return jnp.logical_and(
            s.status == jnp.int32(SolveStatus.RUNNING), s.iters < max_iter
        )

    def body(s: SolverState):
        s = dual_pivot_step(prob, s, opts, backend)
        if opts.refactor_every > 0:
            due = jnp.logical_and(
                jnp.logical_and(s.iters > 0, s.iters % opts.refactor_every == 0),
                s.status == jnp.int32(SolveStatus.RUNNING),
            )
            s = jax.lax.cond(
                due,
                lambda st: refactorize(
                    prob, st, backend, opts.pricing, opts.update_defer > 0
                ),
                lambda st: st,
                s,
            )
        return s

    final = jax.lax.while_loop(cond, body, state0)

    if opts.verify_terminal:
        MAX_VERIFY_ROUNDS = 4

        def needs_verify(carry):
            s, rounds = carry
            return jnp.logical_and(
                jnp.logical_and(
                    jnp.logical_and(
                        s.status != jnp.int32(SolveStatus.RUNNING),
                        s.iters < max_iter,
                    ),
                    s.iters > s.last_refac,
                ),
                rounds < MAX_VERIFY_ROUNDS,
            )

        def reverify(carry):
            s, rounds = carry
            s = refactorize(prob, s, backend, opts.pricing, opts.update_defer > 0)
            s = s._replace(status=jnp.int32(SolveStatus.RUNNING))
            return jax.lax.while_loop(cond, body, s), rounds + 1

        final, _ = jax.lax.while_loop(
            needs_verify, reverify, (final, jnp.int32(0))
        )

    status = jnp.where(
        final.status == jnp.int32(SolveStatus.RUNNING),
        jnp.int32(SolveStatus.MAX_ITER),
        final.status,
    )
    return final._replace(status=status)


@functools.partial(jax.jit, static_argnames=("opts",))
def _warm_jit(
    A, b, c, basis0, opts: SimplexOptions, max_iter, u=None, at_upper0=None
) -> SolverState:
    """Dual loop to primal feasibility, then the primal loop to optimality —
    ONE executable, zero host round-trips between the phases."""
    from simplex_tpu.core.solver import solve_state

    dtype = opts.dtype
    prob = Problem(
        A=A.astype(dtype),
        b=b.astype(dtype),
        c=c.astype(dtype),
        u=None if u is None else u.astype(dtype),
    )
    prob = with_pricing_shadow(prob, opts.pricing_dtype, opts.pricing)
    backend = get_backend(opts.backend)
    state0 = initial_state(
        prob, basis0, dtype, opts.pricing, opts.update_defer, at_upper0,
        opts.multi_price,
    )
    s = dual_solve_state(prob, state0, opts, max_iter, backend)

    def to_primal(s):
        # exact inverse + (for devex) exact incremental reduced costs at the
        # phase switch; the primal loop then certifies true optimality (it
        # re-prices everything — usually one pass and out)
        s = refactorize(prob, s, backend, opts.pricing, opts.update_defer > 0)
        if opts.pricing == "steepest":
            # the dual loop pivots WITHOUT maintaining the steepest-edge
            # norms (it never reads them), so the entry-basis gammas are
            # stale here; recompute exactly for the primal cleanup — one
            # (m, m) x (m, n) GEMM at the phase switch
            from simplex_tpu import sparse as _bsp2
            from simplex_tpu.core.state import _steepest_gamma_sparse

            if isinstance(prob.A, _bsp2.BlockSparse):
                s = s._replace(
                    gamma=_steepest_gamma_sparse(
                        s.B_inv, prob.A.astype(dtype), dtype
                    )
                )
            else:
                T = jnp.matmul(
                    s.B_inv, prob.A.astype(dtype),
                    precision=jax.lax.Precision.HIGHEST,
                )
                s = s._replace(gamma=1 + jnp.sum(T * T, axis=0))
        s = s._replace(status=jnp.int32(SolveStatus.RUNNING))
        return solve_state(prob, s, opts, max_iter, backend)

    return jax.lax.cond(
        s.status == jnp.int32(SolveStatus.OPTIMAL),
        to_primal,
        lambda s: s,
        s,
    )


def _entry_dual_feasibility(A, c, basis_arr, at_upper0, u, opts) -> float:
    """min signed reduced cost over nonbasic columns for the entry basis.
    >= -tol means dual-feasible.

    Exact f64 on the host up to m=2048; beyond that the O(m^3) single-core
    solve would dominate a warm restart's latency, so the check runs on
    device in fp32 (Newton-Schulz inverse — the solver's own refactorize
    machinery; the caller's tolerance is fp32-scaled anyway)."""
    basis_np = np.asarray(basis_arr, np.int64)
    m = len(basis_np)
    # FIXED (u == 0) columns are never dual-eligible in dual_pivot_step
    # (their reduced cost is unconstrained) — exclude them here too, or a
    # warm re-solve with pinned-at-0 artificials whose stored duals came
    # from an ESCALATED big-M penalty would be rejected spuriously
    fixed_np = None
    if u is not None:
        fixed_np = np.asarray(u, np.float64) <= 0
    from simplex_tpu import sparse as _bsp

    sp_host = False
    try:
        import scipy.sparse as _sps

        sp_host = _sps.issparse(A)
    except ImportError:  # pragma: no cover - scipy is a baked-in dep
        pass
    # BlockSparse always routes to the device branch (assembling dense A
    # from tiles on the host would defeat the format; the fp32 device check
    # matches the caller's fp32-scaled tolerance)
    if m <= 2048 and not isinstance(A, _bsp.BlockSparse):
        c64 = np.asarray(c, np.float64)
        if sp_host:
            B64 = np.asarray(A[:, basis_np].todense(), np.float64)
        else:
            B64 = np.asarray(A, np.float64)[:, basis_np]
        try:
            y = np.linalg.solve(B64.T, c64[basis_np])
        except np.linalg.LinAlgError:
            return -np.inf  # singular entry basis: let the caller reject
        # keep the whole check in f64: y @ <jax f32 array> would dispatch a
        # f32 GEMM whose ~5e-5 error rivals the acceptance tolerance
        # (vec @ scipy.sparse stays f64 and returns a dense ndarray)
        e = (
            np.asarray(y @ A).ravel() - c64
            if sp_host
            else y @ np.asarray(A, np.float64) - c64
        )
        if at_upper0 is not None:
            e = np.where(np.asarray(at_upper0, bool), -e, e)
        nonbasic = np.ones(A.shape[1], bool)
        nonbasic[basis_np] = False
        if fixed_np is not None:
            nonbasic &= ~fixed_np
        return float(np.min(e[nonbasic])) if nonbasic.any() else 0.0
    from simplex_tpu.core.linalg import inverse_newton
    from simplex_tpu.kernels import xla as _xk

    if isinstance(A, _bsp.BlockSparse):
        Aj = A.astype(jnp.float32)
    elif sp_host:
        Aj = _bsp.from_scipy(A, dtype=jnp.float32)
    else:
        Aj = jnp.asarray(A, jnp.float32)
    B = _xk.gather_basis_matrix(Aj, jnp.asarray(basis_np, jnp.int32))
    B_inv, resid = inverse_newton(B)
    if not np.isfinite(float(resid)) or float(resid) > 1e-2:
        return -np.inf
    cj = jnp.asarray(c, jnp.float32)
    y = jnp.matmul(jnp.take(cj, jnp.asarray(basis_np, jnp.int32)), B_inv,
                   precision=_EXACT)
    e = _xk.reduced_costs(y, Aj, cj)
    if at_upper0 is not None:
        e = jnp.where(jnp.asarray(at_upper0, bool), -e, e)
    e = e.at[jnp.asarray(basis_np, jnp.int32)].set(jnp.inf)
    if fixed_np is not None:
        e = jnp.where(jnp.asarray(fixed_np), jnp.inf, e)
    return float(jnp.min(e))


def solve_dual(
    A,
    b,
    c,
    *,
    basis0: Optional[np.ndarray] = None,
    u=None,
    at_upper0: Optional[np.ndarray] = None,
    options: SimplexOptions = DEFAULT_OPTIONS,
    check_entry: bool = True,
):
    """Re-solve  max c.x  s.t.  A x = b, 0 <= x (<= u)  from a DUAL-feasible
    basis (typically the optimal basis of a prior solve whose ``b`` changed).

    ``basis0=None`` uses the trailing slack basis — dual-feasible iff all
    costs of the structural columns are <= 0 (the classic from-scratch dual
    simplex setup). ``at_upper0`` carries the prior solve's nonbasic-at-upper
    flags for bounded problems (``SolveResult.at_upper``).

    Returns the same :class:`~simplex_tpu.core.solver.SolveResult` contract
    as :func:`~simplex_tpu.core.solver.solve`: the dual loop restores primal
    feasibility, then the primal loop certifies optimality in the same
    executable. ``status=INFEASIBLE`` means the dual became unbounded — a
    Farkas proof that the perturbed primal is empty (sound because entry
    dual feasibility is verified when ``check_entry``; the verify_terminal
    pass re-checks the terminal decision from an exact inverse).

    Raises ``ValueError`` when ``check_entry`` finds the entry basis not
    dual-feasible (e.g. ``c`` changed, not ``b``): warm-start a COST change
    with the primal loop instead — ``solve(A, b, c_new, basis0=prev.basis)``
    (the old basis stays primal-feasible when only c moved).
    """
    from simplex_tpu.core.solver import finalize_result
    from simplex_tpu import sparse as _bsp

    A_host = A if isinstance(A, np.ndarray) else None
    is_sparse = isinstance(A, _bsp.BlockSparse)
    if not is_sparse:
        import scipy.sparse as _sps

        if _sps.issparse(A):
            # scipy input, as in solve(): tile for the device, keep scipy
            # as the host reference (polish + entry check)
            A_host = A.tocsc()
            A = _bsp.from_scipy(A_host, dtype=options.dtype)
            is_sparse = True
    if not is_sparse:
        A = jnp.asarray(A)
    b = jnp.asarray(b)
    c = jnp.asarray(c)
    m, n = A.shape
    if is_sparse:
        # the dual loop reads A through rmatvec / column gathers only; the
        # same combination guards as the sparse primal path apply
        if options.backend != "xla":
            raise NotImplementedError("sparse A requires backend='xla'")
        # segmented pricing silently deactivates on tiles here (no
        # per-segment structures are built for the warm path; the full
        # tile pass prices — same gate semantics as dense indivisibility)
    if m > n:
        raise ValueError(f"m > n ({m} > {n}): not a canonical-form LP")
    slack = basis0 is None
    basis_arr = (
        jnp.arange(n - m, n, dtype=jnp.int32)
        if slack
        else jnp.asarray(basis0, jnp.int32)
    )
    bounded = u is not None
    u_np = None
    if bounded:
        u_np = np.asarray(u, np.float64)
        if np.any(u_np < 0):
            raise ValueError("negative upper bound (shift lowers to 0 first)")
        if not np.any(np.isfinite(u_np)):
            bounded = False
            u_np = None
    # the same combination guards solve() applies (the primal cleanup loop
    # runs inside the same executable)
    if options.pricing == "steepest" and options.multi_price > 0:
        raise NotImplementedError(
            "pricing='steepest' does not compose with multi_price's "
            "buffered minor pivots (it DOES compose with update_defer)"
        )
    if check_entry:
        tol = 10 * options.resolve_eps()
        min_e = _entry_dual_feasibility(
            A_host if A_host is not None else A, c, basis_arr,
            at_upper0 if bounded else None, u_np, options,
        )
        if min_e < -tol:
            raise ValueError(
                f"entry basis is not dual-feasible (min signed reduced cost "
                f"{min_e:.3g} < {-tol:.3g}); the dual simplex requires one. "
                "For a cost change, warm-start the primal loop instead: "
                "solve(A, b, c, basis0=prev.basis)"
            )
    max_iter = options.resolve_max_iter(m, n)
    import dataclasses as _dc

    exec_options = _dc.replace(options, max_iter=0, checkpoint_every=0)
    u_arr = jnp.asarray(u_np, options.dtype) if bounded else None
    at_up_arr = None
    if bounded:
        at_up_arr = (
            jnp.zeros(n, bool)
            if at_upper0 is None
            else jnp.asarray(at_upper0, bool)
        )
    final = _warm_jit(
        A, b, c, basis_arr, exec_options, max_iter, u_arr, at_up_arr
    )
    x_b_np, basis_np, c_b_np, y_np, status_i, iters_i = jax.device_get(
        (final.x_b, final.basis, final.c_b, final.y, final.status, final.iters)
    )
    return finalize_result(
        A, A_host, b, c, x_b_np, basis_np, c_b_np, y_np, status_i, iters_i,
        final.B_inv, options,
        u_np=u_np, at_upper_dev=final.at_upper if bounded else None,
    )
