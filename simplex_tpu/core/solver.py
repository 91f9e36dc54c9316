"""The jitted solve driver: one ``lax.while_loop`` around the pivot step.

Replaces the reference's host-driven ``do { ... } while (++i < MAX_ITER)``
(``src/v4_cub_reduction.cu:286-359``) — its 3-4 host syncs per pivot become
traced predicates, so the whole solve is a single XLA executable that leaves
the device only once, at the end.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from simplex_tpu.config import DEFAULT_OPTIONS, SimplexOptions
from simplex_tpu.core.state import (
    Problem,
    SolverState,
    initial_state,
    initial_state_slack,
    with_pricing_shadow,
)
from simplex_tpu.core.step import (
    perturb_activate,
    perturb_clear,
    pivot_step,
    recompute_xy,
    refactorize,
)
from simplex_tpu.kernels.dispatch import get_backend
from simplex_tpu.status import SolveStatus


class SolveResult(NamedTuple):
    """Host-side result (mirrors the reference's main() report,
    ``src/v4_cub_reduction.cu:425-445``: z, x_b values keyed by b_ixs,
    status)."""

    z: float
    x: np.ndarray  # (n,) full primal solution (x_b scattered over basis)
    x_b: np.ndarray  # (m,)
    basis: np.ndarray  # (m,) int32
    status: SolveStatus
    iters: int
    # worst primal infeasibility of the returned basic solution
    # (max(0, -min x_b), exact f64 when polish ran): fp32 noise at small
    # scale; a large value means the fp32 path drifted off the feasible
    # region and the 'optimum' overshoots — check before trusting z.
    feas_err: float = 0.0
    # dual solution (simplex multipliers y = c_b B_inv): reduced costs are
    # c - y.A and z == y.b at optimality. The reference never exposed
    # duals; they are free here (the solver maintains y every pivot).
    y: Optional[np.ndarray] = None
    # bounded-variable solves only: nonbasic-at-upper flags of the returned
    # solution (None otherwise). Together with basis this is the full
    # combinatorial state — enough to warm-start a re-solve.
    at_upper: Optional[np.ndarray] = None


def solve_state(
    prob: Problem,
    state0: SolverState,
    opts: SimplexOptions,
    max_iter: int,
    backend=None,
) -> SolverState:
    """Run the pivot loop to termination. Traced; jit/vmap/shard_map-safe.

    ``backend=None`` selects by ``opts.backend``; the distributed solver
    passes its collective backend explicitly."""
    if backend is None:
        backend = get_backend(opts.backend)

    def cond(s: SolverState):
        return jnp.logical_and(
            s.status == jnp.int32(SolveStatus.RUNNING), s.iters < max_iter
        )

    # Anti-degeneracy rhs perturbation (SimplexOptions.perturb_after): armed
    # in-loop when a degenerate streak trips the gate, re-armable on every
    # further streak (accumulating shift, capped at 16 activations), cleared
    # by the verify rounds below before any status is certified.
    perturb = opts.perturb_after > 0 and state0.pert is not None

    def body(s: SolverState):
        s = pivot_step(prob, s, opts, backend)
        if perturb:
            due_pert = jnp.logical_and(
                jnp.logical_and(
                    s.status == jnp.int32(SolveStatus.RUNNING),
                    s.pert.rounds < jnp.int32(16),
                ),
                jnp.logical_and(
                    s.degen >= opts.perturb_after,
                    s.degen % opts.perturb_after == 0,
                ),
            )
            def _arm(st):
                scale = opts.perturb_scale
                if opts.perturb_grow != 1.0:
                    # re-arm k means the previous k shifts failed to break
                    # the stall: escalate geometrically so the shift
                    # dominates whatever tie structure a base-scale one
                    # could not split. The exponent cap must stay small —
                    # delta scales with (1 + |x_b|), which carries the
                    # accumulated shift, so unbounded escalation feeds back
                    # (see config.perturb_grow for the measured blow-up)
                    scale = scale * jnp.asarray(
                        opts.perturb_grow, jnp.float32
                    ) ** jnp.minimum(st.pert.rounds, jnp.int32(4)).astype(
                        jnp.float32
                    )
                return perturb_activate(prob, st, backend, scale)

            s = jax.lax.cond(due_pert, _arm, lambda st: st, s)
        if opts.recompute_every > 0:
            due_xy = jnp.logical_and(
                jnp.logical_and(
                    s.iters > 0, s.iters % opts.recompute_every == 0
                ),
                s.status == jnp.int32(SolveStatus.RUNNING),
            )
            s = jax.lax.cond(
                due_xy,
                lambda st: recompute_xy(prob, st, opts.resolve_defer() > 0),
                lambda st: st,
                s,
            )
        if opts.refactor_every > 0:
            due = jnp.logical_and(
                jnp.logical_and(s.iters > 0, s.iters % opts.refactor_every == 0),
                s.status == jnp.int32(SolveStatus.RUNNING),
            )
            s = jax.lax.cond(
                due,
                lambda st: refactorize(
                    prob, st, backend, opts.pricing, opts.resolve_defer() > 0
                ),
                lambda st: st,
                s,
            )
        return s

    final = jax.lax.while_loop(cond, body, state0)

    if opts.verify_terminal:
        # A terminal decision (optimal/unbounded/singular) made from a stale
        # product-form inverse may be fp32 drift: refactorize, clear the
        # status, and re-run the pivot loop until the decision is made from
        # an exact inverse. (An outer loop, not a per-iteration cond, so the
        # vmapped batch solver doesn't pay O(m^3) per step via select.)
        # Rounds are capped: each round ends with a refactorized decision, so
        # a round that changes nothing terminates the loop anyway, and the cap
        # bounds worst-case churn from sub-tolerance fp noise.
        MAX_VERIFY_ROUNDS = 4

        def needs_verify(carry):
            s, rounds = carry
            # an active perturbation also forces a round: the decision was
            # made for the SHIFTED rhs — clear it, refactorize against the
            # true rhs, and re-run (usually a handful of cleanup pivots)
            stale = s.iters > s.last_refac
            if perturb:
                stale = jnp.logical_or(stale, s.pert.on)
            return jnp.logical_and(
                jnp.logical_and(
                    jnp.logical_and(
                        s.status != jnp.int32(SolveStatus.RUNNING),
                        s.iters < max_iter,
                    ),
                    stale,
                ),
                rounds < MAX_VERIFY_ROUNDS,
            )

        def reverify(carry):
            s, rounds = carry
            if perturb:
                s = jax.lax.cond(s.pert.on, perturb_clear, lambda st: st, s)
            s = refactorize(prob, s, backend, opts.pricing, opts.resolve_defer() > 0)
            s = s._replace(status=jnp.int32(SolveStatus.RUNNING))
            return jax.lax.while_loop(cond, body, s), rounds + 1

        final, _ = jax.lax.while_loop(
            needs_verify, reverify, (final, jnp.int32(0))
        )

    if perturb:
        # The verify rounds normally clear the shift, but three exits can
        # leave it armed: verify_terminal=False skips them entirely,
        # MAX_VERIFY_ROUNDS can be exhausted while the shift keeps
        # re-arming, and a MAX_ITER exit never enters them. Returning with
        # pert.on means x_b/z solve the SHIFTED rhs (error ~perturb_scale)
        # — drop the shift and re-derive x_b/y from the true rhs before
        # anything downstream reads them (the polish only masks it when
        # m <= polish_max_m).
        def _drop_shift(s):
            s = perturb_clear(s)
            return recompute_xy(prob, s, opts.resolve_defer() > 0)

        final = jax.lax.cond(
            final.pert.on, _drop_shift, lambda s: s, final
        )

    status = jnp.where(
        final.status == jnp.int32(SolveStatus.RUNNING),
        jnp.int32(SolveStatus.MAX_ITER),
        final.status,
    )
    return final._replace(status=status)


@functools.partial(jax.jit, static_argnames=("opts", "slack_init"))
def _solve_jit(
    A: jnp.ndarray,
    b: jnp.ndarray,
    c: jnp.ndarray,
    basis0: jnp.ndarray,
    opts: SimplexOptions,
    max_iter,  # traced: changing the budget does not retrace
    slack_init: bool,
    u=None,  # (n,) native upper bounds; None = classic x >= 0
    at_upper0=None,
    A_price=None,  # prebuilt BlockSparse pricing shadow (pricing_sparse)
    A_segs=None,  # per-segment tile structures (sparse segmented pricing)
) -> SolverState:
    dtype = opts.dtype
    prob = Problem(
        A=A.astype(dtype),
        b=b.astype(dtype),
        c=c.astype(dtype),
        u=None if u is None else u.astype(dtype),
        A_segs=A_segs,
    )
    if A_price is not None:
        # block-sparse shadow built on the host (tile occupancy is a data-
        # dependent structure, so it cannot be traced here)
        prob = prob._replace(A_price=A_price)
    else:
        prob = with_pricing_shadow(prob, opts.pricing_dtype, opts.pricing)
    if slack_init:
        state0 = initial_state_slack(
            prob, dtype, opts.pricing, opts.resolve_defer(), at_upper0,
            opts.multi_price, perturb=opts.perturb_after > 0,
        )
    else:
        state0 = initial_state(
            prob, basis0, dtype, opts.pricing, opts.resolve_defer(), at_upper0,
            opts.multi_price, perturb=opts.perturb_after > 0,
        )
    return solve_state(prob, state0, opts, max_iter)


def _host_basis_cols(A, basis_np):
    """HOST A[:, basis] for the f64 polish, for every A flavor solve takes.

    numpy (or device-dense) -> plain column slice; scipy.sparse -> a sparse
    column slice (row-chunk matvecs below work on csr directly, so the m x m
    dense cast never happens); BlockSparse -> assembly from the stored tiles
    (the only host pull a fully-sparse solve makes is the tiles themselves).
    """
    from simplex_tpu import sparse as _bsp

    if isinstance(A, _bsp.BlockSparse):
        return _bsp.gather_columns_host(A, basis_np)
    try:
        import scipy.sparse as _sps

        if _sps.issparse(A):
            return A.tocsc()[:, basis_np].tocsr()
    except ImportError:  # pragma: no cover - scipy is a baked-in dep
        pass
    return np.asarray(A)[:, basis_np]


def _single_device(x) -> bool:
    return (
        isinstance(x, jax.Array)
        and getattr(x, "sharding", None) is not None
        and len(x.sharding.device_set) == 1
    )


def _same_single_device(a, b) -> bool:
    """Both dense single-device jax arrays on the SAME device (the device
    polish jit would otherwise fail at dispatch with 'incompatible
    devices' — keep the host fallback for cross-device callers)."""
    return (
        _single_device(a)
        and _single_device(b)
        and a.sharding.device_set == b.sharding.device_set
    )


def run_polish(A, A_host, b, basis_np, x_b0, B_inv):
    """Exact-f64 refinement of the returned basis — the ONE dispatcher every
    solve mode ends in (finalize_result and solve_with_checkpoints used to
    carry near-verbatim copies of this decision tree).

    Dense single-device solves refine ON DEVICE (the host here is a single
    tunnel-contended core; see _refine_device_jit); sparse / sharded /
    cross-device flavors take the host path against ``A_host`` (or a pulled
    ``A``). An ill-conditioned basis falls back to one host f64 LU.

    Returns ``(x_b64, ok)``; ``ok=False`` means even the LU failed
    (numerically singular basis) and the caller should keep its fp32 values.
    """
    from simplex_tpu import sparse as _bsp

    is_sparse = isinstance(A, _bsp.BlockSparse)
    A_pol = A_host if A_host is not None else (A if is_sparse else None)
    if not is_sparse and _same_single_device(A, B_inv):
        x_b64, ok = _polish_refine_device(A, b, basis_np, x_b0, B_inv)
    else:
        if A_pol is None:
            A_pol = np.asarray(A)
        x_b64, ok = _polish_refine(A_pol, b, basis_np, x_b0, B_inv)
    if not ok:
        from simplex_tpu.logging import get_logger

        get_logger("solver").warning(
            "polish refinement stalled (ill-conditioned basis); "
            "falling back to O(m^3) LU"
        )
        if A_pol is None:
            A_pol = np.asarray(A)
        AB = _host_basis_cols(A_pol, basis_np)
        if not isinstance(AB, np.ndarray):
            AB = AB.toarray()  # scipy.sparse column slice
        try:
            x_b64 = np.linalg.solve(
                np.asarray(AB, np.float64), np.asarray(b, np.float64)
            )
            ok = True
        except np.linalg.LinAlgError:
            ok = False
    return x_b64, ok


@functools.partial(jax.jit, static_argnames=("iters",))
def _refine_device_jit(A, b, basis, x0, B_inv, iters: int = 4):
    """f64 iterative refinement entirely ON DEVICE (see _polish_refine).

    Traced under a scoped ``enable_x64`` by ``_polish_refine_device``. TPU
    has no f64 LU, but f64 GEMV/elementwise lower fine (measured ~0 ms at
    m=8192 on v5e) — and the basis gather + f64 cast stay in HBM. This
    exists because the HOST is a single tunnel-contended core here: the
    same gather+cast measured 0.16 s standalone but 4-15 s inside a solve
    process, which made the host polish the dominant share of
    time-to-optimal (round-5 probes, scripts/r5_polish_probe.py).

    The f64 residual is computed by SCANNING column blocks of A (gather +
    f64 cast of (m, CH) transients): materializing the full f64 basis
    block costs 8 m^2 bytes — measured OOM at m=16384 (18.0 G > 15.75 G
    HBM next to the resident A / shadow / inverse).

    Runs a fixed ``iters`` passes but carries the BEST iterate (refinement
    with an fp32 preconditioner can diverge on ill-conditioned bases; the
    host version breaks on a non-decreasing residual — here jnp.where
    keeps the minimizer, same result).
    """
    m = basis.shape[0]
    b64 = b.astype(jnp.float64)
    x = x0.astype(jnp.float64)
    scale = jnp.maximum(1.0, jnp.max(jnp.abs(b64)))
    CH = min(2048, m)
    nblk = -(-m // CH)
    pad = nblk * CH - m
    basis_p = jnp.pad(basis, (0, pad))  # padded slots multiply a 0 below

    def matvec64(xv):
        xp = jnp.pad(xv, (0, pad))

        def blk(acc, i):
            idx = jax.lax.dynamic_slice(basis_p, (i * CH,), (CH,))
            cols = jnp.take(A, idx, axis=1).astype(jnp.float64)
            xs = jax.lax.dynamic_slice(xp, (i * CH,), (CH,))
            return acc + jnp.matmul(cols, xs), None

        acc, _ = jax.lax.scan(
            blk, jnp.zeros((m,), jnp.float64),
            jnp.arange(nblk, dtype=jnp.int32),
        )
        return acc

    def one(carry, _):
        x, best_x, best_nr = carry
        r = b64 - matvec64(x)
        nr = jnp.max(jnp.abs(r))
        better = nr < best_nr
        best_x = jnp.where(better, x, best_x)
        best_nr = jnp.where(better, nr, best_nr)
        dx = jnp.matmul(B_inv, r.astype(B_inv.dtype)).astype(jnp.float64)
        return (x + dx, best_x, best_nr), None

    (x, best_x, best_nr), _ = jax.lax.scan(
        one, (x, x, jnp.asarray(jnp.inf, jnp.float64)), None, length=iters
    )
    r = b64 - matvec64(x)
    nr = jnp.max(jnp.abs(r))
    better = nr < best_nr
    best_x = jnp.where(better, x, best_x)
    best_nr = jnp.where(better, nr, best_nr)
    return best_x, best_nr, scale


def _polish_refine_device(A, b, basis_np, x_b0, B_inv, iters: int = 4):
    """Device-side f64 refinement; same contract as ``_polish_refine``.

    Only for a dense single-device ``A`` with a single-device ``B_inv``
    (the sharded/sparse flavors keep the host path).
    """
    with jax.enable_x64(True):  # scoped: jax.config State context manager
        x64, nr, scale = _refine_device_jit(
            A,
            jnp.asarray(np.asarray(b, np.float64)),
            jnp.asarray(basis_np, jnp.int32),
            jnp.asarray(np.asarray(x_b0, np.float64)),
            B_inv,
            iters=iters,
        )
        x = np.asarray(x64, np.float64)
        nr_f = float(nr)
        scale_f = float(scale)
    return x, np.isfinite(nr_f) and nr_f <= 1e-7 * scale_f


def _polish_refine(A, b, basis_np, x_b0, B_inv, iters: int = 4):
    """f64 x_b for the final basis by iterative refinement: O(m^2)/pass.

    Replaces the previous O(m^3) host LU (a silent multi-minute single-core
    tail at m=16k — round-1 verdict item #9) with 2-4 refinement passes
    that reuse the solve's own fp32 inverse as the preconditioner:

        r  = b - A_B x        exact f64 residual, computed in 1024-row
                              chunks so the f64 cast of A_B never
                              materializes whole (A's entries are fp32
                              data, so the chunked cast is exact);
        dx = B_inv r          fp32 — each pass cuts the error by
                              ~cond(A_B) * eps_f32.

    ``A`` should be a HOST array and ``B_inv`` may stay a DEVICE array:
    over the tunneled dev runtime, pulling A or the m x m inverse to the
    host costs tens of seconds (measured ~28 s of a 48 s "solve" at
    m=8192) — the preconditioner matvec runs on device with only the
    m-float residual/correction crossing per pass.

    Returns (x64, ok); ok=False (stalled residual: conditioning too high
    for the fp32 preconditioner) sends the caller to the LU fallback.
    """
    if isinstance(A, np.ndarray):
        # Gather + f64-cast the basis block in one THREADED chunked pass
        # into a C-order f64 buffer (m^2 * 8B; 2.1 GB at the 16k polish
        # cap), done ONCE per polish — the pre-round-5 code re-cast 268 MB
        # per refinement pass, and the naive ``A[:, basis].astype(f64)``
        # also returns an F-order array. NB: this host path is only the
        # sparse/sharded fallback now — dense single-device solves refine
        # ON DEVICE (_polish_refine_device), because on a single
        # tunnel-contended host core this gather+cast measured 4-15 s
        # (0.16 s standalone; the thread pool helps only multi-core
        # hosts — numpy take / cast-assign release the GIL).
        from concurrent.futures import ThreadPoolExecutor

        m_rows = A.shape[0]
        AB = np.empty((m_rows, len(basis_np)), np.float64)

        def _chunk(s):
            e = min(s + 512, m_rows)
            AB[s:e] = A[s:e].take(basis_np, axis=1)

        with ThreadPoolExecutor(max_workers=8) as ex:
            list(ex.map(_chunk, range(0, m_rows, 512)))
    else:
        AB = _host_basis_cols(A, basis_np)
        if AB.dtype != np.float64:
            AB = AB.astype(np.float64)  # sparse flavors: one O(nnz) cast
    if isinstance(B_inv, jax.Array):
        dtype = B_inv.dtype

        def precond(r):
            return np.asarray(
                jnp.matmul(B_inv, jnp.asarray(r, dtype)), np.float64
            )

    else:
        B_inv_np = np.asarray(B_inv)

        def precond(r):
            return (B_inv_np @ r.astype(B_inv_np.dtype)).astype(np.float64)

    b64 = np.asarray(b, np.float64)
    x = np.asarray(x_b0, np.float64)
    m = AB.shape[0]
    scale = max(1.0, float(np.abs(b64).max()))
    CH = 1024

    def residual(xv):
        if isinstance(AB, np.ndarray):
            return b64 - AB @ xv  # AB is f64: one BLAS dgemv
        # scipy.sparse: row-chunked csr matvecs (f64 throughout)
        r = np.empty(m, np.float64)
        for s in range(0, m, CH):
            r[s : s + CH] = b64[s : s + CH] - AB[s : s + CH] @ xv
        return r

    prev = np.inf
    nr = np.inf
    stale = True  # does nr describe the CURRENT x?
    for _ in range(iters):
        r = residual(x)
        nr = float(np.abs(r).max())
        stale = False
        if not np.isfinite(nr) or nr >= prev:
            break
        prev = nr
        if nr <= 1e-11 * scale:
            break
        x = x + precond(r)
        stale = True
    if stale:
        nr = float(np.abs(residual(x)).max())
    return x, np.isfinite(nr) and nr <= 1e-7 * scale


def solve(
    A,
    b,
    c,
    *,
    u=None,
    basis0: Optional[np.ndarray] = None,
    at_upper0: Optional[np.ndarray] = None,
    options: SimplexOptions = DEFAULT_OPTIONS,
) -> SolveResult:
    """Solve  max c.x  s.t.  A x = b, 0 <= x (<= u)  from a feasible basis.

    ``basis0=None`` assumes the canonical trailing identity slack block
    (the reference's only supported input shape, ``src/v1_baseline.cu:
    336-339``); pass an explicit (m,) index array otherwise.

    ``u`` (optional, (n,) with +inf for unbounded columns) activates the
    native bounded-variable rule: nonbasic columns may sit at 0 or at u_j
    (``at_upper0`` marks the latter for the starting point), the ratio test
    is two-sided, and bound-flip steps change no basis at all. The row-per-
    bound expansion the general route used through round 2 is thereby
    unnecessary (the reference's GLPK oracle handled bounds natively,
    ``glpk_interface.cpp:46-52``; its CUDA solvers never did).
    """
    # keep a host reference to A when the caller passed one: the polish
    # needs A's basis columns on the host, and re-pulling a device A over
    # the tunneled runtime costs tens of seconds at 8k (measured)
    from simplex_tpu import sparse as _bsp

    A_host = A if isinstance(A, np.ndarray) else None
    is_sparse = isinstance(A, _bsp.BlockSparse)
    if not is_sparse:
        import scipy.sparse as _sps

        if _sps.issparse(A):
            # scipy input: tile to BlockSparse for the device (occupied
            # tiles only — the dense A is never materialized anywhere) and
            # keep the scipy matrix as the host reference for the polish
            A_host = A.tocsc()
            A = _bsp.from_scipy(A_host, dtype=options.dtype)
            is_sparse = True
    if not is_sparse:
        A = jnp.asarray(A)
    b = jnp.asarray(b)
    c = jnp.asarray(c)
    m, n = A.shape
    if is_sparse:
        # fully sparse solve path: pricing/ftran/refactorization all read
        # the stored tiles only (kernels.xla dispatches per op). The
        # unsupported combinations below all slice dense column ranges or
        # maintain dense incremental structures.
        if options.backend != "xla":
            raise NotImplementedError("sparse A requires backend='xla'")
    if m > n:
        raise ValueError(f"m > n ({m} > {n}): not a canonical-form LP")
    if b.shape != (m,) or c.shape != (n,):
        raise ValueError(f"shape mismatch: A {A.shape}, b {b.shape}, c {c.shape}")
    bounded = u is not None
    u_np = None
    if bounded:
        u_np = np.asarray(u, np.float64)
        if u_np.shape != (n,):
            raise ValueError(f"u shape {u_np.shape} != ({n},)")
        if np.any(u_np < 0):
            raise ValueError("negative upper bound (shift lowers to 0 first)")
        if not np.any(np.isfinite(u_np)):
            bounded = False  # all-inf bounds: classic path, zero overhead
            u_np = None
    if options.pricing == "steepest" and options.multi_price > 0:
        raise NotImplementedError(
            "pricing='steepest' maintains per-pivot exact norms (the weight "
            "recurrence needs the full w/v passes every pivot); it does not "
            "compose with multi_price's buffered minor pivots. It DOES "
            "compose with update_defer (the u/binv_q corrections telescope "
            "over the pending pairs)."
        )
    if options.multi_price > 0 and options.pricing == "devex":
        # multiple pricing is dantzig-only; without this the option would
        # silently no-op AND size the deferred/candidate buffers by K
        # (round-5 review finding — the loud-inert policy of the batch and
        # sharded entry points applies here too)
        import dataclasses as _dc0

        from simplex_tpu.logging import get_logger

        get_logger("solver").warning(
            "multi_price=%d is inert under pricing='devex' (dantzig only); "
            "solving without multiple pricing", options.multi_price
        )
        options = _dc0.replace(options, multi_price=0)
    A_price = None
    if options.pricing_sparse and options.pricing == "dantzig" and not is_sparse:
        if options.partial_pricing > 1:
            raise NotImplementedError(
                "pricing_sparse needs the full-shadow pass; segmented "
                "pricing (partial_pricing) slices dense arrays"
            )
        if options.backend != "xla":
            raise NotImplementedError("pricing_sparse requires backend='xla'")
        from simplex_tpu import sparse as _bsp

        A_price = _bsp.from_dense(
            A_host if A_host is not None else np.asarray(A),
            dtype=jnp.dtype(options.pricing_dtype),
        )
    A_segs = None
    if is_sparse and options.partial_pricing > 1 and options.pricing == "dantzig":
        # segmented pricing over tiles: per-segment static tile structures
        # (sparse.split_columns), built at the PRICING dtype to mirror the
        # dense path's shadow-segment slices. Same silent-inactivity gate
        # as dense (_partial_active): indivisible n / tile-straddling
        # segments / too-small segments leave A_segs None and the full
        # tile pass prices instead.
        S = options.partial_pricing
        bc = A.block_shape[1]
        w = n // S if n % S == 0 else 0
        if w and w % bc == 0 and w >= options.partial_min_segment:
            pd = jnp.dtype(options.pricing_dtype)
            A_segs = tuple(
                seg.astype(pd) for seg in _bsp.split_columns(A, S)
            )
    max_iter = options.resolve_max_iter(m, n)
    slack_init = basis0 is None
    basis_arr = (
        jnp.arange(n - m, n, dtype=jnp.int32)
        if slack_init
        else jnp.asarray(basis0, jnp.int32)
    )
    # the budget is a traced scalar and checkpoint cadence is host-side:
    # keep them out of the static jit key so solves differing only in
    # max_iter share one executable (see core/checkpoint.py)
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
    final = _solve_jit(
        A, b, c, basis_arr, exec_options, max_iter, slack_init,
        u_arr, at_up_arr, A_price, A_segs,
    )
    # SELECTIVE host pull: only the O(m)/scalar leaves. device_get of the
    # whole state drags B_inv (+ deferred buffers) through the tunnel —
    # measured ~15-30 s of pure transfer at m=8192; B_inv stays on device
    # and is only touched by the polish's device-side matvec.
    x_b_np, basis_np, c_b_np, y_np, status_i, iters_i = jax.device_get(
        (final.x_b, final.basis, final.c_b, final.y, final.status, final.iters)
    )
    return finalize_result(
        A, A_host, b, c, x_b_np, basis_np, c_b_np, y_np, status_i, iters_i,
        final.B_inv, options,
        u_np=u_np, at_upper_dev=final.at_upper if bounded else None,
    )


def finalize_result(
    A,
    A_host,
    b,
    c,
    x_b_np,
    basis_np,
    c_b_np,
    y_np,
    status_i,
    iters_i,
    B_inv,
    options: SimplexOptions,
    *,
    u_np=None,
    at_upper_dev=None,
) -> SolveResult:
    """Shared host-side result contract for EVERY solve mode.

    Single-chip, 1-D sharded, and 2-D sharded solves all end here: f64
    polish of the returned basis by O(m^2) iterative refinement against the
    solve's own inverse (O(m^3) LU only as the ill-conditioned fallback),
    ``feas_err`` from the polished point, duals passed through, and — for
    bounded-variable solves — the at-upper columns folded into b_eff / z.
    Round-2 verdict weak #2/#3: the sharded modes used to skip the polish
    and feasibility audit entirely (1-D) or pay a host LU tail (2-D).

    ``B_inv`` may be a device array (possibly sharded): the refinement's
    preconditioner matvec runs on device and only m-float vectors cross the
    host boundary per pass.
    """
    n = np.asarray(c).shape[0]
    m = len(basis_np)
    at_upper_np = None
    b_eff = b
    ub_basic = None
    z_fixed = 0.0  # objective contribution of nonbasic-at-upper columns
    bounded = u_np is not None
    if bounded:
        at_upper_np = np.array(jax.device_get(at_upper_dev), bool)
        at_upper_np[basis_np] = False  # invariant; belt-and-braces
        up_cols = np.where(at_upper_np)[0]
        c64 = np.asarray(c, np.float64)
        if len(up_cols):
            A_b = A_host if A_host is not None else A
            cols = _host_basis_cols(A_b, up_cols)
            Axu = (
                np.asarray(cols @ u_np[up_cols], np.float64)
                if not isinstance(cols, np.ndarray)
                else cols.astype(np.float64) @ u_np[up_cols]
            )
            b_eff = np.asarray(b, np.float64) - Axu
            z_fixed = float(c64[up_cols] @ u_np[up_cols])
        ub_basic = u_np[basis_np]

    def _bounded_feas(x_vals) -> float:
        lo_err = max(0.0, float(-np.min(x_vals))) if len(x_vals) else 0.0
        if ub_basic is None:
            return lo_err
        up_err = float(np.max(np.asarray(x_vals) - ub_basic, initial=0.0))
        return max(lo_err, up_err)

    feas_err = 0.0
    if options.polish and m <= options.polish_max_m:
        # Exact values for the returned (combinatorial) basis: re-derive
        # x_b in float64. Removes fp32 accumulation error from the reported
        # optimum without touching the device solve. NO clamping: z must be
        # the objective of the true basic solution (A_B x_b = b_eff), and
        # any genuine violation is surfaced as feas_err rather than silently
        # zeroed into an A x != b 'solution'.
        # sparse flavors (BlockSparse / scipy) pass through untouched —
        # _host_basis_cols assembles only the basis columns; see run_polish
        # for the device-vs-host dispatch
        x_b64, ok = run_polish(A, A_host, b_eff, basis_np, x_b_np, B_inv)
        if ok:
            feas_err = _bounded_feas(x_b64)
            x_b_np = x_b64.astype(x_b_np.dtype)
            z = float(np.asarray(c, np.float64)[basis_np] @ x_b64) + z_fixed
        else:
            z = float(np.dot(c_b_np, x_b_np)) + z_fixed
            feas_err = _bounded_feas(x_b_np)
    else:
        z = float(np.dot(c_b_np, x_b_np)) + z_fixed
        feas_err = _bounded_feas(x_b_np)
    x = np.zeros(n, dtype=x_b_np.dtype)
    if at_upper_np is not None:
        up_cols = np.where(at_upper_np)[0]
        x[up_cols] = u_np[up_cols].astype(x_b_np.dtype)
    x[basis_np] = x_b_np
    return SolveResult(
        z=z,
        x=x,
        x_b=x_b_np,
        basis=basis_np,
        status=SolveStatus(int(status_i)),
        iters=int(iters_i),
        feas_err=feas_err,
        y=y_np,
        at_upper=at_upper_np,
    )
