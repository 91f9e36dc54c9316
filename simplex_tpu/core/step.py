"""One revised-simplex pivot as a pure, jittable function.

This re-expresses the reference's pivot loop body (``src/v4_cub_reduction.cu:
286-359``) as a single traced function over the :class:`SolverState` pytree.
The key structural change (SURVEY.md §3.1): the reference crosses the
host<->device boundary 3-4x per pivot for the optimality test, unboundedness
test, and leaving-index readback; here all three are traced scalars and the
loop never leaves the device.

Math (v2/v3/v4 semantics — quadratic product-form B_inv update, linear
x_b / y updates; reference README.md:17-19):

  pricing      e_j   = y . A_j - c_j ;  entering p = argmin e ;
               optimal iff min e >= -eps
  ftran        alpha = B_inv @ A_p
  ratio test   theta_j = x_b_j / alpha_j over alpha_j > tol ;  leaving q =
               argmin theta ;  unbounded iff no eligible alpha
  update       eta_i = -alpha_i/alpha_q (i != q), 1/alpha_q - 1 (i = q)
               B_inv += eta (x) B_inv[q]                    [O(m^2)]
               x_b   -= theta * alpha ;  x_b[q] = theta     [O(m)]
               y     += (d_p / alpha_q) * B_inv_old[q]      [O(m)]
               with d_p = c_p - y . A_p = -e_p
               c_b[q] = c_p ;  basis[q] = p

The x_b and y forms are the textbook equivalents of the reference's
``x_b += (B_inv_q . b) * E_q`` and ``y += ((c_p - c_b_q) + c_b . E_q) *
B_inv_q`` (``src/v4_cub_reduction.cu:347-356``) — identical values, fewer
dots (verified in tests/test_step.py against from-scratch recomputation).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from simplex_tpu.config import SimplexOptions
from simplex_tpu.core.state import Problem, SolverState
from simplex_tpu.status import SolveStatus

# TPU MXU default for f32 matmuls is single-pass bf16 (~3 decimal digits).
# That is fine for the big streaming ops (pricing / base ftran — HBM-bound,
# and their noise is absorbed by exact re-checks and refactorization), but
# NOT for the small exact-verification dots or the deferred-update algebra,
# where correction errors get baked into later pending rows multiplicatively
# (observed: divergence to UNBOUNDED on v5e with update_defer>0). All O(m)
# and O(L m) dots below therefore pin full-f32 accumulation.
_EXACT = jax.lax.Precision.HIGHEST


def _dot(a, b):
    return jnp.dot(a, b, precision=_EXACT)


def _partial_active(opts: SimplexOptions, prob: Problem) -> bool:
    """Static decision: segmented pricing needs divisible n and segments big
    enough to amortize the exact-recheck / dry-segment fallbacks (tiny LPs
    were measured 2.5x SLOWER with S=8 than with full pricing).

    Sparse A segments only when solve() could build the per-segment tile
    structures (``prob.A_segs``); without them the full tile pass prices.
    """
    from simplex_tpu import sparse as _bsp

    if isinstance(prob.A, _bsp.BlockSparse):
        return prob.A_segs is not None
    return (
        opts.partial_pricing > 1
        and prob.A.shape[1] % opts.partial_pricing == 0
        and prob.A.shape[1] // opts.partial_pricing >= opts.partial_min_segment
    )


def _multi_pricing(
    prob: Problem,
    state: SolverState,
    opts: SimplexOptions,
    eps,
    use_bland,
    dtype,
    bounded: bool,
):
    """Multiple pricing (suboptimization): pick the entering column from a
    K-candidate buffer, refilling it only when no candidate improves.

    The refill prices ALL columns once (bf16 shadow first, exact fp32 when
    the shadow is stale or Bland is active), takes the K most improving, and
    ftrans them in ONE (m, m) x (m, K) GEMM — so the per-pivot m^2 fp32 read
    of the base inverse (the measured per-pivot floor, docs/TUNING.md)
    amortizes over up to K pivots. Minor pivots between refills update each
    candidate's tableau column and reduced cost EXACTLY by the product form
    (see pivot_step's post-pivot block), the same O(m)-per-candidate math
    the reference spends on x_b/y (src/v4_cub_reduction.cu:347-356).

    FROZEN-BASE representation: the stored candidate columns are BASE
    ftrans (``B_inv @ A_j``, no pending corrections) and the base matrix is
    only rewritten when the pending-pair buffer actually fills (the
    ``npend >= L_eff`` refill trigger — the same amortized cadence as the
    plain deferred path; round 4 flushed at EVERY refill, which is an m^2
    read+write per refill and dominated the near-optimum tail where refills
    run per pivot). The caller reconstructs the entering column exactly per
    pivot as ``alpha0 + U.T (R A_p)`` (O(Lm)) over the FULL pending set, so
    every ratio test runs on a numerically FRESH column regardless of when
    the pairs were appended. The pre-round-4 scheme updated the buffered
    columns incrementally by the product form — mathematically exact, but
    the fp32 drift COMPOUNDS across minor pivots and was measured
    (8192x16384, v5e) to mislead the leaving-variable choice into
    exactly-infeasible bases (1242 negative basic values in f64 at pivot
    5121) that no refactorization can repair.

    Returns ``(p, min_e, alpha0_p, cand, j_star, B_inv, U, R, npend)``;
    ``min_e`` is the signed improvement criterion of the chosen candidate,
    or — when the refill's exact full pass found nothing improving — the
    exact minimum over all nonbasic columns, so the caller's
    ``optimal = min_e >= -eps`` test is always decided from exact values.
    The trailing four are the possibly-flushed representation (unchanged
    when no refill ran).

    Refills are SEGMENTED when ``partial_pricing`` composes (dense A with a
    pricing shadow, divisible n, segments >= max(partial_min_segment, K)):
    refill r prices only column segment (r mod S) — the same rotation that
    gives segmented Dantzig its short pivot paths — falling back to the full
    shadow and then the exact full pass when the segment is dry. Measured
    motivation (v5e, 8192x16384): full-pass refills follow the plain-Dantzig
    path (~21k pivots vs segmented's ~4.6k) and their tail collapsed to
    ~146 pivots/s (exact top_k sort over all n every refill + per-pivot
    refills near the optimum); segment rotation fixes the path, approx_max_k
    fixes the sort.
    """
    from simplex_tpu import sparse as _bsp
    from simplex_tpu.core.state import CandBuffer
    from simplex_tpu.kernels import xla as _xk

    cand = state.cand
    K = cand.idx.shape[0]  # opts.multi_price clamped to n by _cand_extras
    n = prob.A.shape[1]

    def signed_full(e_all):
        return jnp.where(state.at_upper, -e_all, e_all) if bounded else e_all

    def signed_sel(e_vals, idxs):
        if bounded:
            return jnp.where(jnp.take(state.at_upper, idxs), -e_vals, e_vals)
        return e_vals

    def mask_s(s_all):
        pen = jnp.asarray(_xk.BASIC_PENALTY, s_all.dtype)
        return s_all.at[state.basis].add(pen)

    def topk(s_masked):
        # Candidate SELECTION only (termination never reads these values):
        # approx_max_k lowers to the TPU-native PartialReduce instead of the
        # full sort lax.top_k pays — that sort was the dominant refill cost
        # on v5e. Exact on CPU; recall ~0.95 on TPU is harmless here (a
        # missed candidate is just not in this buffer round).
        negv, idxs = jax.lax.approx_max_k(-s_masked, K)
        return negv, idxs.astype(jnp.int32)

    # Cut for penalized-basic entries landing in a top-K: segments that
    # overlap the slack-basis block routinely have fewer than K improving
    # nonbasics, so BASIC_PENALTY-masked basics fill the tail of the top-K.
    # recheck() alone can't reject them — fp32 drift in y can push a BASIC
    # column's exact reduced cost below -eps, and re-entering it duplicates
    # a basis column -> SINGULAR (the exact hazard mask_basic exists for).
    # Any masked value carries ~1e30; genuine reduced costs never approach
    # 1e15, so the half-penalty cut excludes exactly the basics without
    # rejecting real candidates over shadow (bf16) noise.
    pen_cut = jnp.asarray(0.5 * _xk.BASIC_PENALTY, dtype)

    def recheck(idxs, negv):
        # exact f32 reduced costs of the chosen candidates (O(K m)); the
        # MASKED selection values negv veto penalized basics (see pen_cut).
        # The gathered columns are THREADED to the ftran below — the gather
        # reads the full f32 A once, so re-gathering in _fill would double
        # the dominant refill pass.
        A_c = _xk.gather_columns(prob.A, idxs).astype(dtype)
        e1 = (
            jnp.matmul(state.y, A_c, precision=_EXACT)
            - jnp.take(prob.c, idxs).astype(dtype)
        )
        valid = jnp.logical_and(
            signed_sel(e1, idxs) < -eps, -negv.astype(dtype) < pen_cut
        )
        return e1, valid, A_c

    s_now = jnp.where(cand.valid, signed_sel(cand.e, cand.idx), jnp.inf)
    best_now = jnp.min(s_now)
    # staleness cutoff: a candidate is usable only while it still delivers
    # a fraction of the refill-time best improvement. Without it the minor
    # loop grinds on barely-improving leftovers (measured: 8k fp32 K=16 ran
    # past 30k pivots at 145 p/s without terminating — see config).
    thresh = jnp.minimum(
        -eps, jnp.asarray(opts.multi_price_stale, dtype) * cand.e0
    )
    # Refill on a SUSTAINED degenerate streak (config.multi_price_degen):
    # minor pivots on a fixed candidate buffer are the classic
    # suboptimization cycling hazard (measured 2048x4096 disaster — see the
    # config field), and refilling restores the eager pivot choice (fresh
    # exact pricing + Harris-stabilized ratio test). Round 4 refilled on ANY
    # zero-theta pivot, which degenerates to per-pivot full passes on
    # progressing-but-degenerate workloads; a short streak budget keeps the
    # buffer through isolated ties.
    need_refill = jnp.logical_or(
        jnp.logical_or(best_now > thresh, use_bland),
        state.degen >= jnp.int32(max(opts.multi_price_degen, 1)),
    )
    L_eff = opts.resolve_defer()
    if L_eff > 0:
        # pending-pair buffer full: refill (which flushes) BEFORE the append
        # this pivot would overflow it
        need_refill = jnp.logical_or(
            need_refill, state.npend >= jnp.int32(L_eff)
        )

    def _exact_fill(_):
        e_all = _xk.reduced_costs(state.y, prob.A, prob.c).astype(dtype)
        s_all = mask_s(signed_full(e_all))
        min_exact = jnp.min(s_all)
        negv, idxs = topk(s_all)
        e_sel = jnp.take(e_all, idxs)
        valid = -negv < -eps
        # Bland's rule needs the LOWEST improving index, not the K most
        # negative: fill with that single candidate (refill then recurs
        # every pivot while the rule stays active)
        imp = s_all < -eps
        p_b = jnp.argmax(imp).astype(jnp.int32)
        idxs_b = jnp.full((K,), p_b, jnp.int32)
        e_b = jnp.full((K,), jnp.take(e_all, p_b), dtype)
        valid_b = jnp.zeros((K,), bool).at[0].set(jnp.any(imp))
        idxs_out = jnp.where(use_bland, idxs_b, idxs)
        return (
            idxs_out,
            jnp.where(use_bland, e_b, e_sel),
            jnp.where(use_bland, valid_b, valid),
            min_exact,
            _xk.gather_columns(prob.A, idxs_out).astype(dtype),
        )

    def _shadow_full(_):
        # bf16 shadow pass + exact recheck of the K winners; exact full
        # pass only when the shadow came up dry (mirrors the two-stage
        # shadow fallback of the single-candidate path)
        e_sh = _xk.reduced_costs(state.y, prob.A_price, prob.c).astype(dtype)
        s_sh = mask_s(signed_full(e_sh))
        negv1, idxs1 = topk(s_sh)
        e1, valid1, A_c1 = recheck(idxs1, negv1)
        stale = jnp.logical_or(~jnp.any(valid1), use_bland)
        return jax.lax.cond(
            stale,
            _exact_fill,
            lambda _: (idxs1, e1, valid1, jnp.asarray(-jnp.inf, dtype), A_c1),
            None,
        )

    S = opts.partial_pricing
    seg_refill = (
        not isinstance(prob.A, _bsp.BlockSparse)
        and prob.A_price is not None
        and S > 1
        and n % S == 0
        and n // S >= max(opts.partial_min_segment, K)
    )

    def _seg_fill(_):
        w = n // S
        sidx = jnp.mod(cand.seg, jnp.int32(S))

        def mk(s):
            def br(_):
                # static slice: fuses into the pricing dot's operand read
                # (a dynamic_slice of A is a real O(mn/S) HBM copy)
                A_seg = jax.lax.slice_in_dim(
                    prob.A_price, s * w, (s + 1) * w, axis=1
                )
                c_seg = jax.lax.slice_in_dim(prob.c, s * w, (s + 1) * w)
                e_sh = _xk.reduced_costs(state.y, A_seg, c_seg).astype(dtype)
                if bounded:
                    up_seg = jax.lax.slice_in_dim(
                        state.at_upper, s * w, (s + 1) * w
                    )
                    s_sh = jnp.where(up_seg, -e_sh, e_sh)
                else:
                    s_sh = e_sh
                # mask basic columns that live in this segment
                loc = jnp.clip(state.basis - s * w, 0, w - 1)
                in_seg = jnp.logical_and(
                    state.basis >= s * w, state.basis < (s + 1) * w
                )
                s_sh = s_sh.at[loc].add(
                    jnp.where(
                        in_seg, jnp.asarray(_xk.BASIC_PENALTY, s_sh.dtype), 0
                    )
                )
                negv, locidx = topk(s_sh)
                return negv, (s * w + locidx).astype(jnp.int32)

            return br

        negv1, idxs1 = jax.lax.switch(sidx, [mk(s) for s in range(S)], None)
        e1, valid1, A_c1 = recheck(idxs1, negv1)
        stale = jnp.logical_or(~jnp.any(valid1), use_bland)
        return jax.lax.cond(
            stale,
            _shadow_full,
            lambda _: (idxs1, e1, valid1, jnp.asarray(-jnp.inf, dtype), A_c1),
            None,
        )

    def _fill(_):
        if prob.A_price is None:
            idxs, e_sel, valid, min_exact, A_cols = _exact_fill(None)
        elif seg_refill:
            idxs, e_sel, valid, min_exact, A_cols = _seg_fill(None)
        else:
            idxs, e_sel, valid, min_exact, A_cols = _shadow_full(None)
        # The stored candidate columns are BASE ftrans (B_inv @ A_j, no
        # pending corrections): the per-pivot reconstruction
        # ``alpha = alpha0 + U.T (R A_p)`` (see pivot_step) always applies
        # the FULL pending set, so columns stored against the unmodified
        # base stay exactly reconstructible whether or not pairs were
        # pending at refill time. Flushing at every refill (round 4's rule)
        # therefore wasted an m^2 read+write GEMM per refill — measured as
        # a dominant share of the per-pivot-refill tail near the optimum.
        # The flush now happens ONLY on buffer pressure (npend >= L_eff,
        # one of need_refill's triggers), i.e. amortized over L_eff pivots
        # like the plain deferred path.
        #
        # precision MUST be pinned on the ftran GEMM: at DEFAULT precision
        # a (m,m)x(m,K) GEMM lowers to a single bf16 MXU pass on TPU
        # (~4e-3 relative operand rounding -> ~1e-2 absolute alpha noise at
        # m=8192), and every minor-pivot ratio test then runs on that noisy
        # column — measured as x_b drifting 2e-2 off the exact basic
        # solution within 128 pivots (the flagship's per-pivot GEMV ftran
        # lowers to an f32 reduction and stayed at 1e-4 on the same walk).
        if L_eff > 0:

            def _flush_fill(_):
                B2 = state.B_inv + jnp.matmul(
                    state.U.T, state.R, precision=_EXACT
                )
                return (
                    jnp.matmul(B2, A_cols, precision=_EXACT),
                    B2,
                    jnp.zeros_like(state.U),
                    jnp.zeros_like(state.R),
                    jnp.int32(0),
                )

            def _keep_fill(_):
                return (
                    jnp.matmul(state.B_inv, A_cols, precision=_EXACT),
                    state.B_inv,
                    state.U,
                    state.R,
                    state.npend,
                )

            Alpha, B2, U2, R2, npend2 = jax.lax.cond(
                state.npend >= jnp.int32(L_eff), _flush_fill, _keep_fill, None
            )
        else:
            Alpha = jnp.matmul(state.B_inv, A_cols, precision=_EXACT)
            B2, U2, R2 = state.B_inv, state.U, state.R
            npend2 = state.npend
        s_sel = jnp.where(valid, signed_sel(e_sel, idxs), 0.0)
        e0 = jnp.min(s_sel)  # <= 0; refill-best improvement for staleness
        return (
            CandBuffer(
                idx=idxs, alpha=Alpha.T, acols=A_cols.T, e=e_sel,
                valid=valid, e0=e0, seg=cand.seg + 1,
            ),
            min_exact,
            B2,
            U2,
            R2,
            npend2,
        )

    cand2, min_exact, B_inv2, U2, R2, npend2 = jax.lax.cond(
        need_refill,
        _fill,
        lambda _: (
            cand, jnp.asarray(jnp.inf, dtype),
            state.B_inv, state.U, state.R, state.npend,
        ),
        None,
    )
    s2 = jnp.where(cand2.valid, signed_sel(cand2.e, cand2.idx), jnp.inf)
    j_star = jnp.argmin(s2).astype(jnp.int32)
    any_valid = jnp.isfinite(s2[j_star])
    p = cand2.idx[j_star]
    min_e = jnp.where(any_valid, s2[j_star], min_exact)
    alpha0_p = cand2.alpha[j_star]
    return p, min_e, alpha0_p, cand2, j_star, B_inv2, U2, R2, npend2


def pivot_step(
    prob: Problem,
    state: SolverState,
    opts: SimplexOptions,
    backend,
) -> SolverState:
    """Apply one pivot (or set a terminal status). Pure; safe under jit/vmap."""
    dtype = state.B_inv.dtype
    eps_f = opts.resolve_eps()
    eps = jnp.asarray(eps_f, dtype)
    bounded = prob.u is not None

    use_bland = jnp.logical_and(
        opts.bland_after > 0, state.degen >= opts.bland_after
    )

    # Price-mask the basic columns (kernels.xla.mask_basic): drifted fp32
    # duals can make a BASIC column's reduced cost read below -eps, and
    # re-entering one duplicates it in the basis -> singular. Selection and
    # the optimality test use c_eff; all value math uses the true c.
    c_eff = backend.mask_basic(prob.c, state.basis)

    # Multiple pricing is active when the state carries a candidate buffer
    # (single-chip dantzig only: the sharded/batch state builders don't
    # allocate one — their entry points log a loud "multi_price is inert"
    # warning instead of silently ignoring the option).
    multi = (
        opts.multi_price > 0
        and opts.pricing == "dantzig"
        and state.cand is not None
    )

    # ---- Pricing / entering variable (ref :289-302) ----
    if multi:
        (
            p, min_e, alpha_pre, cand_mid, j_star,
            B_base, U_base, R_base, npend_base,
        ) = _multi_pricing(prob, state, opts, eps, use_bland, dtype, bounded)
        # a refill flushes the pending pairs into the base: rebind so every
        # downstream read sees the post-flush representation
        state = state._replace(
            B_inv=B_base, U=U_base, R=R_base, npend=npend_base
        )
    elif bounded and opts.pricing in ("devex", "steepest"):
        # Incremental devex / exact steepest-edge under the bounded rule.
        # The maintained quantities are bound-agnostic: e_j = y.A_j - c_j
        # never carries the sign (it flips at SELECTION only), and both
        # weight recurrences depend on basis geometry alone — a bound-flip
        # pivot changes neither the basis nor y, and the post-pivot block
        # below already gates every incremental update on do_pivot. So the
        # only bounded-specific op is the signed selection + its exact
        # staleness recheck (same structure as the unbounded branch).
        at_up_dx = state.at_upper
        p1, min_s1 = backend.devex_choose_bounded(
            state.e, state.gamma, at_up_dx, eps_f, use_bland
        )
        A_p1 = backend.gather_column(prob.A, p1).astype(dtype)
        c_p1 = backend.gather_cost(prob.c, p1).astype(dtype)
        e_p1 = _dot(state.y, A_p1) - c_p1
        s_p1 = jnp.where(at_up_dx[p1], -e_p1, e_p1)
        already_basic = jnp.any(state.basis == p1)
        stale = jnp.logical_or(
            jnp.logical_or(
                jnp.logical_or(min_s1 >= -eps, s_p1 >= -eps), already_basic
            ),
            use_bland,
        )
        p, min_e = jax.lax.cond(
            stale,
            lambda _: backend.choose_entering_bounded(
                state.y, prob.A, prob.c, at_up_dx, state.basis,
                jnp.int32(0), eps_f, use_bland,
            ),
            lambda _: (p1, s_p1),
            None,
        )
    elif bounded:
        # Bounded-variable rule: the improvement criterion is the SIGNED
        # reduced cost s_j = at_upper_j ? -e_j : e_j (at-upper columns
        # improve by decreasing). Same shadow / segmented / fallback
        # structure as the unbounded Dantzig branches below; the exact
        # re-verification of a shadow/segment winner also re-checks the
        # sign through the CURRENT at_upper flag, so termination
        # (min s >= -eps) is always decided from exact values.
        at_up = state.at_upper
        zero32 = jnp.int32(0)

        def _exact_signed(p_cand):
            A_pc = backend.gather_column(prob.A, p_cand).astype(dtype)
            c_pc = backend.gather_cost(prob.c, p_cand).astype(dtype)
            e_pc = _dot(state.y, A_pc) - c_pc
            return jnp.where(at_up[p_cand], -e_pc, e_pc)

        def _exact_full(_):
            return backend.choose_entering_bounded(
                state.y, prob.A, prob.c, at_up, state.basis, zero32,
                eps_f, use_bland,
            )

        if prob.A_price is not None and not _partial_active(opts, prob):
            p1, _ = backend.choose_entering_bounded(
                state.y, prob.A_price, prob.c, at_up, state.basis, zero32,
                eps_f, use_bland,
            )
            s_p1 = _exact_signed(p1)
            stale = jnp.logical_or(s_p1 >= -eps, use_bland)
            p, min_e = jax.lax.cond(
                stale, _exact_full, lambda _: (p1, s_p1), None
            )
        elif _partial_active(opts, prob):
            S = opts.partial_pricing
            n_all = prob.A.shape[1]
            w = n_all // S
            A_src = prob.A_price if prob.A_price is not None else prob.A
            seg = (state.iters % S).astype(jnp.int32)

            def _price_segment(s):
                def br(_):
                    if prob.A_segs is not None:
                        A_seg = prob.A_segs[s]
                    else:
                        A_seg = jax.lax.slice_in_dim(
                            A_src, s * w, (s + 1) * w, axis=1
                        )
                    c_seg = jax.lax.slice_in_dim(prob.c, s * w, (s + 1) * w)
                    up_seg = jax.lax.slice_in_dim(at_up, s * w, (s + 1) * w)
                    p_loc, mn = backend.choose_entering_bounded(
                        state.y, A_seg, c_seg, up_seg, state.basis,
                        jnp.int32(s * w), eps_f, jnp.asarray(False),
                    )
                    return (s * w + p_loc).astype(jnp.int32), mn

                return br

            p1, _ = jax.lax.switch(
                seg, [_price_segment(s) for s in range(S)], None
            )
            s_p1 = _exact_signed(p1)
            stale = jnp.logical_or(s_p1 >= -eps, use_bland)

            def _fallback(_):
                if prob.A_price is None or not opts.fallback_shadow:
                    return _exact_full(None)
                p2, _ = backend.choose_entering_bounded(
                    state.y, prob.A_price, prob.c, at_up, state.basis,
                    zero32, eps_f, jnp.asarray(False),
                )
                s_p2 = _exact_signed(p2)
                stale2 = jnp.logical_or(s_p2 >= -eps, use_bland)
                return jax.lax.cond(
                    stale2, _exact_full, lambda _: (p2, s_p2), None
                )

            p, min_e = jax.lax.cond(
                stale, _fallback, lambda _: (p1, s_p1), None
            )
        else:
            p, min_e = _exact_full(None)
    elif opts.pricing in ("devex", "steepest"):
        # Incremental reduced costs + Devex or exact steepest-edge weights
        # (same selection rule max e^2/gamma; the weights differ — see the
        # post-pivot block). Termination stays exact:
        # whenever the (drift-prone) incremental test fires — or the chosen
        # candidate's exactly-recomputed reduced cost is not improving — fall
        # back to one exact O(mn) pricing pass for this iteration.
        p1, min_e1 = backend.devex_choose(state.e, state.gamma, eps_f, use_bland)
        A_p1 = backend.gather_column(prob.A, p1).astype(dtype)
        c_p1 = backend.gather_cost(prob.c, p1).astype(dtype)
        e_p1 = _dot(state.y, A_p1) - c_p1
        # stale also when the incremental e picked an already-basic column
        # (its true reduced cost is ~0; drifted e said otherwise)
        already_basic = jnp.any(state.basis == p1)
        stale = jnp.logical_or(
            jnp.logical_or(
                jnp.logical_or(min_e1 >= -eps, e_p1 >= -eps), already_basic
            ),
            use_bland,  # Bland's first-eligible-index rule must be exact
        )
        p, min_e = jax.lax.cond(
            stale,
            lambda _: backend.choose_entering(
                state.y, prob.A, c_eff, eps_f, use_bland
            ),
            lambda _: (p1, min_e1),
            None,
        )
    elif prob.A_price is not None and not _partial_active(opts, prob):
        # Mixed-precision Dantzig: price against the bf16 shadow (half the
        # HBM read), then verify the candidate's reduced cost exactly in f32
        # (O(m)). If it is not truly improving — possible only from bf16
        # noise near the optimum — or Bland's rule is active (its
        # first-eligible-index semantics must be exact for the anti-cycling
        # guarantee), fall back to one exact f32 pricing pass. Termination
        # (min_e >= -eps) is therefore always decided from exact values.
        p1, _ = backend.choose_entering(
            state.y, prob.A_price, c_eff, eps_f, use_bland
        )
        A_p1 = backend.gather_column(prob.A, p1).astype(dtype)
        c_p1 = backend.gather_cost(prob.c, p1).astype(dtype)
        e_p1 = _dot(state.y, A_p1) - c_p1
        stale = jnp.logical_or(e_p1 >= -eps, use_bland)
        p, min_e = jax.lax.cond(
            stale,
            lambda _: backend.choose_entering(
                state.y, prob.A, c_eff, eps_f, use_bland
            ),
            lambda _: (p1, e_p1),
            None,
        )
    elif _partial_active(opts, prob):
        # Segmented Dantzig: price only the (iters mod S)-th column block
        # (1/S of the O(mn) read), verify the winner exactly, and fall back
        # to one full pass when the segment is dry or Bland is active.
        # The segment is selected with a lax.switch over STATIC slices, not
        # a dynamic_slice: a variable-start slice of A is a real O(mn/S)
        # HBM copy in XLA's lowering, while a static slice fuses into the
        # pricing dot's operand read (measured on v5e, see bench notes).
        S = opts.partial_pricing
        n_all = prob.A.shape[1]
        w = n_all // S
        A_src = prob.A_price if prob.A_price is not None else prob.A
        seg = (state.iters % S).astype(jnp.int32)

        def _price_segment(s):
            def br(_):
                if prob.A_segs is not None:
                    # sparse: the segment is its own static tile structure
                    # (lax slices don't apply to the tiled format)
                    A_seg = prob.A_segs[s]
                else:
                    A_seg = jax.lax.slice_in_dim(
                        A_src, s * w, (s + 1) * w, axis=1
                    )
                c_seg = jax.lax.slice_in_dim(c_eff, s * w, (s + 1) * w)
                p_loc, mn = backend.choose_entering(
                    state.y, A_seg, c_seg, eps_f, jnp.asarray(False)
                )
                return (s * w + p_loc).astype(jnp.int32), mn

            return br

        p1, _ = jax.lax.switch(
            seg, [_price_segment(s) for s in range(S)], None
        )
        A_p1 = backend.gather_column(prob.A, p1).astype(dtype)
        c_p1 = backend.gather_cost(prob.c, p1).astype(dtype)
        e_p1 = _dot(state.y, A_p1) - c_p1
        stale = jnp.logical_or(e_p1 >= -eps, use_bland)

        def _fallback(_):
            # Two-stage fallback (opts.fallback_shadow): a dry segment first
            # retries over the FULL bf16 shadow (1/16th the bytes of exact
            # pricing) and verifies that winner exactly; only if the whole
            # shadow is dry — or Bland is active — does the exact full-f32
            # pass run. The optimality decision (min_e >= -eps) still
            # always comes from exact values.
            def _exact(_):
                return backend.choose_entering(
                    state.y, prob.A, c_eff, eps_f, use_bland
                )

            if prob.A_price is None or not opts.fallback_shadow:
                return _exact(None)
            p2, _ = backend.choose_entering(
                state.y, prob.A_price, c_eff, eps_f, jnp.asarray(False)
            )
            A_p2 = backend.gather_column(prob.A, p2).astype(dtype)
            c_p2 = backend.gather_cost(prob.c, p2).astype(dtype)
            e_p2 = _dot(state.y, A_p2) - c_p2
            stale2 = jnp.logical_or(e_p2 >= -eps, use_bland)
            return jax.lax.cond(
                stale2, _exact, lambda _: (p2, e_p2), None
            )

        p, min_e = jax.lax.cond(
            stale, _fallback, lambda _: (p1, e_p1), None
        )
    else:
        p, min_e = backend.choose_entering(
            state.y, prob.A, c_eff, eps_f, use_bland
        )
    optimal = min_e >= -eps

    # ---- FTRAN + ratio test / leaving variable (ref :307-325) ----
    A_p = backend.gather_column(prob.A, p).astype(dtype)
    c_p = backend.gather_cost(prob.c, p).astype(dtype)
    # exact reduced cost of the chosen column (O(m)) — the e/y updates below
    # ride on it, and in multi mode it also gates the entry recheck
    e_p = _dot(state.y, A_p) - c_p  # == min_e under Dantzig; exact under Bland
    # multi implies real pending-pair buffers (state builders size them via
    # resolve_defer); states whose builder ignores multi_price (batch,
    # sharded, trace) carry no candidate buffer, so multi is False there and
    # the dummy (1, 1) U/R stay untouched.
    defer = opts.update_defer > 0 or multi
    if multi:
        # exact per-pivot reconstruction from the FROZEN refill-time base
        # column plus the pairs appended since that refill — numerically
        # fresh (O(Lm), no m^2 read), where the old incremental product-form
        # buffer update compounded fp32 drift across minor pivots and
        # corrupted the leaving-variable choice (see _multi_pricing)
        alpha = alpha_pre + jnp.matmul(
            state.U.T,
            jnp.matmul(state.R, A_p, precision=_EXACT),
            precision=_EXACT,
        )
    elif defer:
        # Lazy product form: the true inverse is B_inv + U.T @ R (telescoped
        # pending rank-1s), so ftran gains two O(L m) corrections but the
        # O(m^2) base read stays on the *unmodified* base matrix.
        alpha = state.B_inv @ A_p + jnp.matmul(
            state.U.T, jnp.matmul(state.R, A_p, precision=_EXACT), precision=_EXACT
        )
    else:
        alpha = state.B_inv @ A_p

    if bounded:
        # direction: entering from its upper bound DEcreases, so every basic
        # value moves by -d * t with d = sigma * alpha.
        from_upper = state.at_upper[p]
        sigma = jnp.where(from_upper, -1, 1).astype(dtype)
        d_vec = sigma * alpha
        u_basic = jnp.take(prob.u, state.basis).astype(dtype)
        u_p = backend.gather_cost(prob.u, p).astype(dtype)
        q, theta_q, unbounded, flip, leave_upper = backend.ratio_argmin_bounded(
            state.x_b, d_vec, u_basic, u_p, state.basis, opts.pivot_tol,
            use_bland, opts.ratio == "harris", opts.feas_tol,
        )
        fused_out = None
    else:
        from_upper = jnp.asarray(False)
        d_vec = alpha
        flip = jnp.asarray(False)
        leave_upper = jnp.asarray(False)
        u_p = jnp.asarray(0, dtype)
        fused = getattr(backend, "ratio_eta", None)
        fused_out = (
            fused(
                state.x_b, alpha, state.basis, opts.pivot_tol, use_bland,
                opts.ratio == "harris", opts.feas_tol,
            )
            if fused is not None
            else None
        )
        if fused_out is not None:
            # one kernel for the whole post-ftran O(m) chain (ratio test + eta
            # vector + x_b axpy) — dispatch latency dominates these at small m
            q, theta_q, unbounded, eta_fused, x_b_fused = fused_out
        elif opts.ratio == "harris":
            q, theta_q, unbounded = backend.ratio_argmin_harris(
                state.x_b, alpha, state.basis, opts.pivot_tol, use_bland,
                opts.feas_tol,
            )
        else:
            q, theta_q, unbounded = backend.ratio_argmin(
                state.x_b, alpha, state.basis, opts.pivot_tol, use_bland
            )

    take = jnp.logical_and(~optimal, ~unbounded)
    # Numerical failure: non-finite pricing value, or a pivot we are about to
    # take whose ratio is non-finite (generalizes v1's ThetaOverflow guard,
    # src/v1_baseline.cu:268-284, which v2+ silently dropped).
    bad = jnp.logical_or(
        ~jnp.isfinite(min_e), jnp.logical_and(take, ~jnp.isfinite(theta_q))
    )
    take = jnp.logical_and(take, ~bad)
    if multi:
        # exact entry recheck: minor-pivot selection rides the buffered
        # reduced costs; before committing, verify the entering candidate
        # still improves in exact arithmetic (e_p above, O(m)). A stale one
        # is skipped AND invalidated below. The threshold is eps/2, LOOSER
        # than the refill's -eps: the refill's (m, K) GEMM and this GEMV
        # reduce in different orders, and a candidate straddling -eps in
        # one rounding but not the other would otherwise be re-selected by
        # the very next refill (same y) and re-rejected here forever — a
        # while_loop livelock, since skipped steps do not advance iters.
        # As the hard backstop, a rejected skip counts toward the degen
        # streak below, so sustained rejection latches Bland (whose refill
        # is single-candidate exact and bypasses this gate).
        s_ep = jnp.where(from_upper, -e_p, e_p) if bounded else e_p
        cand_fresh = s_ep < -(eps * 0.5)
        take = jnp.logical_and(
            take, jnp.logical_or(cand_fresh, use_bland)
        )
    else:
        cand_fresh = jnp.asarray(True)
    # bound-flip steps change no basis: all B_inv / y / c_b / basis updates
    # below gate on do_pivot (basis change); x_b and at_upper also move on
    # flips. flip is the False constant when not bounded, so do_pivot == take
    # and XLA folds the flip arithmetic away entirely.
    do_pivot = jnp.logical_and(take, ~flip)
    do_flip = jnp.logical_and(take, flip)

    alpha_q = alpha[q]
    safe_alpha_q = jnp.where(do_pivot, alpha_q, jnp.asarray(1, dtype))
    inv_aq = jnp.asarray(1, dtype) / safe_alpha_q
    theta_safe = jnp.where(take, theta_q, jnp.asarray(0, dtype))

    binv_q = jax.lax.dynamic_index_in_dim(state.B_inv, q, axis=0, keepdims=False)
    if defer:
        # row q of the TRUE inverse: base row + pending corrections.
        u_q = jax.lax.dynamic_index_in_dim(state.U, q, axis=1, keepdims=False)
        binv_q = binv_q + jnp.matmul(u_q, state.R, precision=_EXACT)

    # ---- Product-form rank-1 update (ref compute_E_q + Sger :331-333) ----
    if fused_out is not None:
        eta = eta_fused
    else:
        eta = (-alpha * inv_aq).at[q].set(inv_aq - 1)
    if defer:
        # Append (eta, binv_q) to the pending buffers instead of touching
        # B_inv; flush all L pairs as one rank-L GEMM when the buffer fills.
        # Appending a zero pair on non-pivot steps is harmless (rank-0).
        eta_pend = jnp.where(do_pivot, eta, jnp.zeros_like(eta))
        row_pend = jnp.where(do_pivot, binv_q, jnp.zeros_like(binv_q))
        U_new = jax.lax.dynamic_update_index_in_dim(
            state.U, eta_pend, state.npend, axis=0
        )
        R_new = jax.lax.dynamic_update_index_in_dim(
            state.R, row_pend, state.npend, axis=0
        )
        npend_new = state.npend + jnp.where(do_pivot, jnp.int32(1), jnp.int32(0))

        def _flush(args):
            B, U, R = args
            return (
                B + jnp.matmul(U.T, R, precision=_EXACT),
                jnp.zeros_like(U),
                jnp.zeros_like(R),
                jnp.int32(0),
            )

        def _keep(args):
            B, U, R = args
            return B, U, R, npend_new

        if multi:
            # frozen base: flushes happen ONLY inside a refill
            # (_multi_pricing), never mid-cycle — the npend >= L refill
            # trigger guarantees the buffers cannot overflow
            B_inv_new = state.B_inv
        else:
            B_inv_new, U_new, R_new, npend_new = jax.lax.cond(
                npend_new >= opts.resolve_defer(),
                _flush,
                _keep,
                (state.B_inv, U_new, R_new),
            )
    else:
        B_inv_new = backend.rank1_update(state.B_inv, eta, binv_q)
        U_new, R_new, npend_new = state.U, state.R, state.npend

    # ---- O(m) primal / dual updates (ref :347-356) ----
    if fused_out is not None:
        x_b_new = x_b_fused
        x_b_flip = state.x_b  # unbounded path: flips never happen
    else:
        x_b_step = state.x_b - theta_safe * d_vec
        # entering value: theta above its lower bound, or u_p - theta below
        # its upper. For the unbounded path from_upper is the False constant
        # and this folds to theta_safe.
        x_p_new = jnp.where(from_upper, u_p - theta_safe, theta_safe)
        x_b_new = x_b_step.at[q].set(x_p_new)
        x_b_flip = x_b_step  # bound flip: every basic value moves, no q swap
    y_new = state.y - (e_p * inv_aq) * binv_q

    c_b_new = state.c_b.at[q].set(c_p)
    basis_new = state.basis.at[q].set(p)

    if bounded:
        lv = state.basis[q]  # leaving column (global index; != p, p nonbasic)
        au = state.at_upper
        au_flip = au.at[p].set(~from_upper)
        au_pivot = au.at[p].set(False).at[lv].set(leave_upper)
        at_upper_new = jnp.where(
            do_pivot, au_pivot, jnp.where(do_flip, au_flip, au)
        )
    else:
        at_upper_new = None

    # ---- Incremental pricing state (devex / steepest-edge only) ----
    if opts.pricing in ("devex", "steepest"):
        # w = updated pivot row of the tableau: rho.A with rho = B_inv_new[q].
        # One O(mn) pass — the same traffic Dantzig spends on y.A, but it
        # yields both the reduced-cost update (e -= e_p w, since w_p = 1 and
        # e_new_p = 0) and the weight update.
        # w must be exact (f32): the bf16 pricing shadow is NOT used here —
        # incremental-e noise compounds over pivots (unlike Dantzig's, which
        # is re-derived from y every iteration and re-checked exactly).
        rho = binv_q * inv_aq
        if opts.pricing == "steepest":
            # EXACT steepest edge (Goldfarb-Reid), gamma_j = 1 + ||t_j||^2
            # with t_j = B_inv A_j. After the pivot t_j' = t_j + w_j * eta
            # (w_j here is ALREADY the beta of the textbook recurrence:
            # rho = binv_q/alpha_q gives w_j = (pivot row)_j / alpha_q), so
            #   gamma_j' = gamma_j - 2 w_j v_j + w_j^2 (1 + ||alpha||^2)
            # with v_j = t_j . alpha = A_j . (B^{-T} alpha) — one extra
            # O(m^2) GEMV (u = alpha @ B_inv) per pivot buys the exact norms
            # the reference's ladder left unchecked (README.md:21). The
            # leaving column's weight is set exactly: t_lv' = e_q + eta =>
            # gamma_lv' = 1 + (1 + ||alpha||^2 - alpha_q^2) / alpha_q^2.
            # u must read the TRUE pre-pivot inverse: under deferred updates
            # that is the frozen base plus the pending pairs, corrected in
            # O(L m) (same telescoping as the ftran above).
            u = jnp.matmul(alpha, state.B_inv, precision=_EXACT)
            if defer:
                u = u + jnp.matmul(
                    jnp.matmul(alpha, state.U.T, precision=_EXACT),
                    state.R,
                    precision=_EXACT,
                )
            # w and v are BOTH O(mn) row-vector passes over A — the
            # dominant steepest-edge traffic. pricing_update2 stacks them
            # into one (2, m) x (m, n) GEMM so A streams from HBM once.
            fused2 = getattr(backend, "pricing_update2", None)
            if fused2 is not None:
                w, v = fused2(prob.A.astype(dtype), rho, u)
            else:
                w = backend.pricing_update(prob.A.astype(dtype), rho)
                v = backend.pricing_update(prob.A.astype(dtype), u)
        else:
            w = backend.pricing_update(prob.A.astype(dtype), rho)
        e_new = state.e - e_p * w
        if opts.pricing == "steepest":
            gp1 = 1 + _dot(alpha, alpha)
            lv_se = state.basis[q]
            gamma_lv = 1 + (gp1 - safe_alpha_q * safe_alpha_q) * (
                inv_aq * inv_aq
            )
            gse = state.gamma - 2 * w * v + (w * w) * gp1
            gse = gse.at[lv_se].set(gamma_lv)
            # floor at the provable minimum 1 (fp cancellation in the
            # three-term recurrence can dip below); cap like devex
            gamma_new = jnp.clip(gse, 1.0, 1e30)
        else:
            gamma_p = backend.gather_cost(state.gamma, p)
            # clamp: gamma grows multiplicatively across pivots and can
            # overflow fp32 over tens of thousands of iterations (observed
            # nan at 16k); the devex weights are a steepest-edge heuristic,
            # so capping is harmless
            gamma_new = jnp.clip(
                jnp.maximum(state.gamma, (w * w) * jnp.maximum(gamma_p, 1)),
                1.0,
                1e30,
            )
    else:
        e_new = state.e
        gamma_new = state.gamma

    degen_new = jnp.where(
        theta_safe <= jnp.asarray(opts.degen_tol, dtype), state.degen + 1, jnp.int32(0)
    )

    status_new = jnp.where(
        optimal,
        jnp.int32(SolveStatus.OPTIMAL),
        jnp.where(
            unbounded,
            jnp.int32(SolveStatus.UNBOUNDED),
            jnp.where(bad, jnp.int32(SolveStatus.SINGULAR), jnp.int32(SolveStatus.RUNNING)),
        ),
    )

    def sel(new, old):
        return jnp.where(do_pivot, new, old)

    if multi:
        # Exact reduced-cost update of every candidate, computed FRESH each
        # pivot: e_j' = e_j - (e_p / a_q) * w_j with w_j = binv_q_true . A_j
        # from the cached A columns (O(K m), VMEM-resident) — binv_q already
        # carries the pending-pair corrections, so w is the true tableau
        # pivot row restricted to the candidates. The stored alpha columns
        # stay FROZEN (refill-time base ftrans; the entering column is
        # reconstructed exactly per pivot — see the ftran above). The
        # entering candidate is invalidated; so is a candidate that failed
        # its exact entry recheck (cand_fresh), pivot or not.
        from simplex_tpu.core.state import CandBuffer

        w_c = jnp.matmul(cand_mid.acols, binv_q, precision=_EXACT)
        drop = jnp.logical_or(
            do_pivot, jnp.logical_and(~cand_fresh, ~optimal)
        )
        cand_new = CandBuffer(
            idx=cand_mid.idx,
            alpha=cand_mid.alpha,
            acols=cand_mid.acols,
            e=sel(cand_mid.e - (e_p * inv_aq) * w_c, cand_mid.e),
            valid=jnp.where(
                drop,
                jnp.logical_and(cand_mid.valid, cand_mid.idx != p),
                cand_mid.valid,
            ),
            e0=cand_mid.e0,
            seg=cand_mid.seg,
        )
    else:
        cand_new = state.cand

    return SolverState(
        # defer mode: the flush cond already applies only on pivot steps; a
        # do_pivot select here would add a full m^2 pass every pivot
        B_inv=B_inv_new if defer else sel(B_inv_new, state.B_inv),
        # three-way: basis change takes x_b_new (q swapped in), a bound flip
        # takes the axpy only. do_flip is the False constant when unbounded.
        x_b=jnp.where(
            do_pivot, x_b_new, jnp.where(do_flip, x_b_flip, state.x_b)
        ),
        y=sel(y_new, state.y),
        c_b=sel(c_b_new, state.c_b),
        basis=sel(basis_new, state.basis),
        iters=state.iters + jnp.where(take, jnp.int32(1), jnp.int32(0)),
        status=status_new,
        # a rejected-stale multi-price skip (no pivot taken, solve still
        # RUNNING) counts toward the degen streak: bounded livelock escape —
        # bland_after eventually latches the exact single-candidate rule
        degen=jnp.where(
            take,
            degen_new,
            jnp.where(
                jnp.logical_and(
                    ~cand_fresh,
                    status_new == jnp.int32(SolveStatus.RUNNING),
                ),
                state.degen + 1,
                state.degen,
            ),
        ),
        last_refac=state.last_refac,
        e=sel(e_new, state.e),
        gamma=sel(gamma_new, state.gamma),
        # non-pivot steps appended a zero (rank-0) pair and left npend alone,
        # so these are already no-ops without do_pivot masking
        U=U_new,
        R=R_new,
        npend=npend_new,
        at_upper=at_upper_new,
        cand=cand_new,
        pert=state.pert,
    )


def _effective_rhs(prob: Problem, state: SolverState, dtype) -> jnp.ndarray:
    """b - A x_N: the rhs the BASIC variables actually solve against.

    x_N is nonzero only under the bounded-variable rule (nonbasic columns
    parked at a finite upper bound); unbounded problems return b untouched.
    One O(mn) matvec — refactorization-cadence cost, not per-pivot.
    """
    b = prob.b.astype(dtype)
    if prob.u is not None:
        from simplex_tpu.core.state import nonbasic_upper_values
        from simplex_tpu.kernels import xla as _xk

        x_N = nonbasic_upper_values(prob, state.at_upper, dtype)
        b = b - _xk.matvec(prob.A, x_N)
    if state.pert is not None:
        # active anti-degeneracy shift: the basic block tracks b_eff + w
        # (w = 0 when inactive), see SimplexOptions.perturb_after
        b = b + state.pert.w.astype(dtype)
    return b


def perturb_activate(
    prob: Problem, state: SolverState, backend, scale: float
) -> SolverState:
    """Arm (or re-arm) the anti-degeneracy rhs perturbation.

    Shifts every basic value into the feasible interior by a tiny
    deterministic amount delta > 0 and accumulates w += B @ delta so the
    tracked rhs moves with it (``_effective_rhs``): the algebraic invariant
    ``B x_b = b_eff + w`` stays EXACT, and every subsequent ratio test sees
    strictly positive numerators — degenerate stalls break because each
    pivot now makes real progress on the perturbed problem. Cleared (and
    the true rhs restored by refactorization) before any terminal status is
    certified — see the verify rounds in ``core.solver.solve_loop``.
    O(m^2) for the basis gather + matvec, paid only when a degenerate
    streak trips the ``perturb_after`` gate.
    """
    dtype = state.x_b.dtype
    m = state.x_b.shape[0]
    # low-discrepancy multipliers in [0.5, 1.5]: deterministic (replayable,
    # no PRNG state) and tie-free by construction (golden-ratio sequence)
    r = 0.5 + jnp.mod(
        jnp.arange(m, dtype=dtype) * jnp.asarray(0.6180339887498949, dtype)
        + jnp.asarray(0.137, dtype),
        1.0,
    )
    delta = jnp.asarray(scale, dtype) * (1 + jnp.abs(state.x_b)) * r
    if prob.u is not None:
        # aim into the interior: shift toward the FARTHER bound, capped at a
        # quarter of the room so the perturbed point never crosses a bound
        u_b = jnp.take(prob.u, state.basis).astype(dtype)
        room_up = jnp.maximum(u_b - state.x_b, 0)  # inf when unbounded above
        room_dn = jnp.maximum(state.x_b, 0)
        go_up = jnp.logical_or(~jnp.isfinite(room_up), room_up >= room_dn)
        room = jnp.where(go_up, room_up, room_dn)
        delta = jnp.minimum(delta, 0.25 * room)
        delta = jnp.where(go_up, delta, -delta)
    B = backend.gather_basis_matrix(prob.A, state.basis).astype(dtype)
    w = jnp.matmul(B, delta, precision=_EXACT)
    pert = state.pert
    return state._replace(
        x_b=state.x_b + delta,
        degen=jnp.int32(0),  # fresh streak; Bland stays the LAST resort
        pert=pert._replace(
            w=pert.w + w,
            on=jnp.ones((), bool),
            rounds=pert.rounds + 1,
        ),
    )


def perturb_clear(state: SolverState) -> SolverState:
    """Drop the rhs shift. The caller MUST refactorize (or recompute_xy)
    right after: x_b still holds the perturbed point until it is re-derived
    from the true rhs."""
    pert = state.pert
    return state._replace(
        pert=pert._replace(w=jnp.zeros_like(pert.w), on=jnp.zeros((), bool))
    )


def refactorize(
    prob: Problem,
    state: SolverState,
    backend,
    pricing: str = "dantzig",
    defer: bool = False,
) -> SolverState:
    """Re-invert the true basis to purge accumulated fp error.

    ``B_inv = inv(A[:, basis])`` recomputed from scratch, then ``x_b`` and
    ``y`` re-derived. O(m^3), amortized over ``refactor_every`` pivots. The
    reference has no equivalent (its fp32 product-form drifts unchecked).
    Under devex pricing also recomputes the incremental reduced costs exactly
    and resets the reference weights (the standard Devex restart).
    """
    dtype = state.B_inv.dtype
    m = state.B_inv.shape[0]
    B = backend.gather_basis_matrix(prob.A, state.basis).astype(dtype)

    # Newton-Schulz inversion seeded with the current (drifted) product-form
    # inverse: X <- X (2I - B X), squaring the residual each iteration — the
    # seed's ~1e-4 drift hits the fp32 floor in two iterations. Measured
    # 200 ms vs 37 s for LU inversion at m=8192 on v5e (LU parallelizes
    # poorly on the MXU; it also cannot be lowered inside this nested
    # control flow without faulting the v5e worker). A seed too far gone to
    # contract — heavy drift from a run of huge 1/alpha_q pivots, or a
    # checkpoint that carried only the basis — restarts from the
    # Pan-Schreiber scaled transpose, which converges for ANY nonsingular
    # basis (pure GEMMs, so also safe inside this control flow).
    from simplex_tpu.core.linalg import inverse_newton

    X0 = state.B_inv
    if defer:
        # fold any pending deferred pairs into the seed (exact telescoping)
        X0 = X0 + jnp.matmul(state.U.T, state.R, precision=_EXACT)
    B_inv, _resid = inverse_newton(B, seed=X0)
    x_b = jnp.matmul(B_inv, _effective_rhs(prob, state, dtype), precision=_EXACT)
    y = jnp.matmul(state.c_b, B_inv, precision=_EXACT)
    new = state._replace(
        B_inv=B_inv,
        # NO clamp: x_b must stay the exact basic solution (A_B x_b = b).
        # Clamping negatives here breaks that invariant, and the error
        # compounds across refactorizations — observed as a primal-infeasible
        # "optimum" overshooting the true objective by 1e-3 at 16k x 32k
        # (13 clamped refactorizations). Slightly negative entries are fp
        # noise the ratio test already tolerates (it prices max(x_b, 0)).
        x_b=x_b,
        y=y,
        last_refac=state.iters,
        # pending deferred updates are subsumed by the exact re-inversion
        U=jnp.zeros_like(state.U),
        R=jnp.zeros_like(state.R),
        npend=jnp.int32(0),
    )
    if pricing in ("devex", "steepest"):
        from simplex_tpu.kernels import xla as _xk

        # pricing_update = the exact rmatvec (HIGHEST dense / tile passes)
        e = _xk.pricing_update(prob.A.astype(dtype), y) - prob.c.astype(dtype)
        # devex: standard restart (reference weights reset to 1). Steepest:
        # KEEP gamma — the true norms depend only on the BASIS, which
        # refactorization does not change; recomputing them exactly would
        # cost an O(m^2 n) GEMM per refactorization.
        gamma = state.gamma if pricing == "steepest" else jnp.ones_like(
            state.gamma
        )
        new = new._replace(e=e, gamma=gamma)
    if state.cand is not None:
        # candidate tableau columns were ftran'd against the OLD (drifted)
        # representation: invalidate so the next pivot refills exactly
        new = new._replace(
            cand=state.cand._replace(valid=jnp.zeros_like(state.cand.valid))
        )
    return new


def recompute_xy(prob: Problem, state: SolverState, defer: bool) -> SolverState:
    """Refresh x_b and y from the current (possibly lazy) inverse.

    O(m^2) matvecs at exact precision — cheap next to a pivot, and it stops
    the incremental O(m) updates' drift from compounding into ratio-test
    errors. Does NOT touch the inverse itself (that is refactorize's job).
    """
    dtype = state.B_inv.dtype
    b = _effective_rhs(prob, state, dtype)
    x_b = jnp.matmul(state.B_inv, b, precision=_EXACT)
    y = jnp.matmul(state.c_b, state.B_inv, precision=_EXACT)
    if defer:
        x_b = x_b + jnp.matmul(
            state.U.T, jnp.matmul(state.R, b, precision=_EXACT), precision=_EXACT
        )
        y = y + jnp.matmul(
            jnp.matmul(state.c_b, state.U.T, precision=_EXACT),
            state.R,
            precision=_EXACT,
        )
    new = state._replace(x_b=x_b, y=y)
    if state.cand is not None:
        # candidate reduced costs ride on y: refresh-from-scratch next pivot
        new = new._replace(
            cand=state.cand._replace(valid=jnp.zeros_like(state.cand.valid))
        )
    return new
