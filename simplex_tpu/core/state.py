"""Solver-state pytree.

The reference keeps solver state as ~20 raw device pointers allocated from a
table (``PtrAlloc`` lists, ``src/v4_cub_reduction.cu:245-254``). The TPU-native
equivalent is a single immutable pytree threaded through ``lax.while_loop`` —
XLA keeps every leaf resident in HBM across iterations with zero host traffic.

State leaves (shapes for an m x n problem):
  B_inv  (m, m)  explicit basis inverse, product-form maintained
  x_b    (m,)    basic variable values        (= B_inv @ b)
  y      (m,)    dual multipliers / pricing   (= c_b @ B_inv)
  c_b    (m,)    objective coefficients of the basis
  basis  (m,)    column index of each basic variable (int32)
  iters  ()      pivot counter (int32)
  status ()      SolveStatus code (int32)
  degen  ()      consecutive-degenerate-pivot counter (int32), drives the
                 Bland's-rule fallback
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from simplex_tpu.status import SolveStatus


class Problem(NamedTuple):
    """A canonical-form LP: maximize c.x  s.t.  A x = b, x >= 0.

    Matches the reference's input contract (``input/sample.txt:7-13``): the
    caller supplies a feasible starting basis (for the reference this is
    always the trailing identity slack block, ``src/v1_baseline.cu:336-339``).

    ``A_price`` is an optional reduced-precision (bfloat16) shadow of ``A``
    used only for the O(mn) pricing pass — the dominant HBM read of every
    pivot. Candidate columns chosen from it are re-verified against the fp32
    ``A`` before pivoting, and termination always uses an exact pass, so it
    changes the pivot *path*, never the correctness contract (see
    ``SimplexOptions.pricing_dtype``).

    ``u`` (optional) are native variable upper bounds: 0 <= x <= u with
    ``+inf`` entries for classically-unbounded columns. When present the
    solver runs the bounded-variable rule (nonbasic-at-upper flags, two-sided
    ratio test, bound-flip pivots) instead of the row-per-bound expansion the
    general route used through round 2. The reference's GLPK oracle handled
    bounds natively inside the library (``solver_glpk.cpp:23``,
    ``glpk_interface.cpp:46-52``); its own CUDA solvers never did.
    """

    A: jnp.ndarray  # (m, n)
    b: jnp.ndarray  # (m,)
    c: jnp.ndarray  # (n,)
    A_price: Optional[jnp.ndarray] = None  # (m, n) bf16 pricing shadow
    u: Optional[jnp.ndarray] = None  # (n,) upper bounds (+inf = none)
    # sparse solves only: per-segment BlockSparse structures for segmented
    # pricing (sparse.split_columns — static tile lists, one per segment,
    # since lax slices don't apply to the tiled format). Built at the
    # pricing dtype, mirroring the dense path's shadow-segment slices; the
    # winner is exactly re-verified against A either way. None = segmented
    # pricing inactive (the full tile pass prices instead).
    A_segs: Optional[tuple] = None


def with_pricing_shadow(
    prob: Problem, pricing_dtype: str, pricing: str = "dantzig"
) -> Problem:
    """Attach the reduced-precision pricing shadow of A when requested.

    One cast pass over A at solve start (trivial next to the pivot loop);
    ``"float32"`` leaves the problem untouched. Devex / steepest-edge never
    read the shadow (their incremental updates must be exact), so skip the
    ~n*m*2-byte HBM copy there.
    """
    if pricing_dtype == "float32" or pricing in ("devex", "steepest"):
        return prob
    return prob._replace(A_price=prob.A.astype(jnp.dtype(pricing_dtype)))


class SolverState(NamedTuple):
    B_inv: jnp.ndarray  # (m, m)
    x_b: jnp.ndarray  # (m,)
    y: jnp.ndarray  # (m,)
    c_b: jnp.ndarray  # (m,)
    basis: jnp.ndarray  # (m,) int32
    iters: jnp.ndarray  # () int32
    status: jnp.ndarray  # () int32
    degen: jnp.ndarray  # () int32
    last_refac: jnp.ndarray  # () int32 — pivot count at the last exact inverse
    # devex pricing extras ((1,) dummies under the dantzig rule; shard-local
    # (n/D,) inside the column-sharded solver):
    e: jnp.ndarray  # (n,) incremental reduced costs
    gamma: jnp.ndarray  # (n,) devex reference weights
    # deferred-update extras ((1, 1) dummies when update_defer == 0). The
    # TRUE inverse is  B_inv + U[:npend].T @ R[:npend]  (exact telescoped
    # product form; see SimplexOptions.update_defer):
    U: jnp.ndarray  # (L, m) pending eta vectors
    R: jnp.ndarray  # (L, m) pending true-inverse rows
    npend: jnp.ndarray  # () int32 — number of valid pending pairs
    # bounded-variable extra (None when Problem.u is None — None is an empty
    # pytree subtree, so the unbounded paths are untouched): True for
    # NONBASIC columns currently sitting at their upper bound. Invariant:
    # always False on basic columns (cleared when a column enters the basis),
    # so  x_N = where(at_upper, u, 0)  is the full nonbasic solution and
    # x_b = B_inv (b - A x_N).
    at_upper: Optional[jnp.ndarray] = None  # (n,) bool
    # multiple-pricing candidate buffer (None when multi_price == 0); see
    # SimplexOptions.multi_price and core/step._multi_pricing.
    cand: Optional["CandBuffer"] = None
    # anti-degeneracy rhs perturbation (None when perturb_after == 0); see
    # SimplexOptions.perturb_after and core/step.perturb_activate.
    pert: Optional["PertState"] = None


class PertState(NamedTuple):
    """Anti-degeneracy rhs perturbation (``SimplexOptions.perturb_after``).

    ``w`` is the accumulated shift in b-SPACE (``w += B @ delta`` at each
    activation, where ``delta`` is the strictly-positive-into-the-interior
    shift applied to ``x_b``): while active, ``x_b`` solves
    ``B x_b = b_eff + w`` exactly, so refactorization and recompute_xy
    reproduce the perturbed point instead of silently undoing it.
    ``on`` marks an active perturbation (cleared + refactorized away by a
    verify_terminal round before any status is certified); ``rounds``
    counts activations (caps re-arming, and is the observability hook)."""

    w: jnp.ndarray  # (m,)
    on: jnp.ndarray  # () bool
    rounds: jnp.ndarray  # () int32


class CandBuffer(NamedTuple):
    """Multiple-pricing (suboptimization) candidate buffer.

    FROZEN-BASE representation (see core/step._multi_pricing): every refill
    first flushes the pending deferred pairs into the base inverse, then
    ftrans the K chosen columns against that base in one GEMM. ``alpha[j]``
    is that REFILL-TIME column — it is never updated afterwards; the exact
    current tableau column of a candidate is reconstructed per pivot as
    ``alpha0 + U.T (R A_j)`` from the pairs appended since the refill
    (O(Lm), numerically FRESH — no compounding product-form drift, which
    was measured to walk the 8192x16384 solve into exactly-infeasible
    bases). ``acols[j]`` caches the gathered A column so the per-pivot
    reduced-cost updates (e_j -= (e_p/alpha_q) binv_q.A_j) are computed
    fresh from the true inverse row each pivot. ``valid`` clears when a
    candidate enters the basis, fails its exact entry recheck, stops
    improving, or the representation is rebuilt (refactorize / recompute
    invalidate the whole buffer)."""

    idx: jnp.ndarray  # (K,) int32 global column indices
    alpha: jnp.ndarray  # (K, m) refill-time base ftran columns (frozen)
    acols: jnp.ndarray  # (K, m) gathered A columns (frozen)
    e: jnp.ndarray  # (K,) reduced costs
    valid: jnp.ndarray  # (K,) bool
    # refill-time best signed improvement (<= 0): the staleness cutoff
    # compares the buffer's current best against multi_price_stale * e0
    # so the minor loop never grinds on barely-improving leftovers
    e0: jnp.ndarray  # () scalar
    # refill counter: under segmented refills (partial_pricing composed with
    # multi_price) refill r prices only column segment (r mod S) — the same
    # rotation that gives segmented Dantzig its short pivot paths — with the
    # usual dry-segment fallback chain (full shadow -> exact full pass).
    # (No default: a jnp scalar default would initialize a JAX backend at
    # import time, before conftest/test code can pin the platform.)
    seg: jnp.ndarray  # () int32


def _pricing_extras(
    prob: Problem, y: jnp.ndarray, dtype, pricing: str, B_inv=None
):
    """(e, gamma) for the devex / steepest-edge rules; (1,) dummies otherwise.

    Devex starts from unit reference weights. EXACT steepest edge starts
    from the true norms gamma_j = 1 + ||B_inv A_j||^2 — one (m,m)x(m,n)
    GEMM at init (``B_inv=None`` means the identity slack basis, where the
    norms are just the column norms of A)."""
    if pricing not in ("devex", "steepest"):
        return jnp.zeros((1,), dtype), jnp.ones((1,), dtype)
    from simplex_tpu import sparse as _bsp

    A = prob.A.astype(dtype)
    if isinstance(A, _bsp.BlockSparse):
        e = (_bsp.rmatvec(A, y) - prob.c).astype(dtype)
        if pricing == "steepest":
            if B_inv is None:
                gamma = (1 + _bsp.col_sumsq(A)).astype(dtype)
            else:
                gamma = _steepest_gamma_sparse(B_inv, A, dtype)
        else:
            gamma = jnp.ones(A.shape[1], dtype)
        return e, gamma
    e = (y @ A - prob.c.astype(dtype)).astype(dtype)
    if pricing == "steepest":
        T = A if B_inv is None else jnp.matmul(
            B_inv, A, precision=jax.lax.Precision.HIGHEST
        )
        gamma = 1 + jnp.sum(T * T, axis=0)
    else:
        gamma = jnp.ones(prob.A.shape[1], dtype)
    return e, gamma


def _steepest_gamma_sparse(B_inv, A, dtype, chunk: int = 512):
    """Exact steepest-edge init gamma_j = 1 + ||B_inv A_j||^2 for a
    BlockSparse A: column chunks are gathered dense and pushed through one
    (m, m) x (m, chunk) GEMM each — O(m^2 n) FLOPs like the dense init,
    with peak extra memory m*chunk instead of the full dense (m, n) T."""
    from simplex_tpu import sparse as _bsp

    m, n = A.shape
    nch = -(-n // chunk)
    idx = jnp.pad(jnp.arange(n, dtype=jnp.int32), (0, nch * chunk - n))

    def one(ids):
        cols = _bsp.gather_columns(A, ids).astype(dtype)  # (m, chunk)
        T = jnp.matmul(B_inv, cols, precision=jax.lax.Precision.HIGHEST)
        return jnp.sum(T * T, axis=0)

    out = jax.lax.map(one, idx.reshape(nch, chunk))
    return (1 + out.reshape(-1)[:n]).astype(dtype)


def _defer_extras(m: int, dtype, update_defer: int):
    """(U, R, npend) pending-update buffers; (1, 1) dummies when disabled."""
    if update_defer > 0:
        zeros = jnp.zeros((update_defer, m), dtype)
        return zeros, zeros, jnp.int32(0)
    return jnp.zeros((1, 1), dtype), jnp.zeros((1, 1), dtype), jnp.int32(0)


def _cand_extras(m: int, n: int, dtype, multi_price: int):
    """Empty candidate buffer when multiple pricing is on; None otherwise.

    K clamps to n: a buffer wider than the column count would make the
    refill's top_k ill-posed (and is pointless anyway)."""
    if multi_price <= 0:
        return None
    K = min(multi_price, n)
    return CandBuffer(
        idx=jnp.zeros((K,), jnp.int32),
        alpha=jnp.zeros((K, m), dtype),
        acols=jnp.zeros((K, m), dtype),
        e=jnp.zeros((K,), dtype),
        valid=jnp.zeros((K,), bool),
        e0=jnp.zeros((), dtype),
        seg=jnp.int32(0),
    )


def _pert_extras(m: int, dtype, perturb: bool):
    """Zeroed perturbation record when enabled; None otherwise."""
    if not perturb:
        return None
    return PertState(
        w=jnp.zeros((m,), dtype),
        on=jnp.zeros((), bool),
        rounds=jnp.int32(0),
    )


def _at_upper_extras(prob: Problem, at_upper0):
    """(n,) nonbasic-at-upper flags when bounded; None otherwise."""
    if prob.u is None:
        return None
    n = prob.A.shape[1]
    if at_upper0 is None:
        return jnp.zeros((n,), bool)
    return jnp.asarray(at_upper0, bool)


def nonbasic_upper_values(prob: Problem, at_upper: jnp.ndarray, dtype) -> jnp.ndarray:
    """x_N as a full (n,) vector: u at nonbasic-at-upper columns, 0 elsewhere.

    ``where`` (not multiply) so the +inf entries of u never meet a 0.
    """
    return jnp.where(at_upper, prob.u, 0).astype(dtype)


def initial_state(
    prob: Problem,
    basis0: jnp.ndarray,
    dtype,
    pricing: str = "dantzig",
    update_defer: int = 0,
    at_upper0=None,
    multi_price: int = 0,
    perturb: bool = False,
) -> SolverState:
    """Build the starting state for a given feasible basis.

    For the canonical slack basis ``basis0 = [n-m, .., n-1]`` this reproduces
    the reference's init phase (``src/v4_cub_reduction.cu:268-280``):
    ``B_inv = I``, ``c_b = c[n-m:]``, ``x_b = b``, ``y = c_b`` (since
    ``y = c_b @ I``). For a general basis it computes the same quantities
    through the basis inverse. When ``prob.u`` is set, ``at_upper0`` marks
    nonbasic columns starting at their upper bound and ``x_b`` solves
    ``B x_b = b - A x_N``.
    """
    m, n = prob.A.shape
    basis0 = jnp.asarray(basis0, jnp.int32)
    from simplex_tpu.kernels import xla as _xk

    B = _xk.gather_basis_matrix(prob.A, basis0).astype(dtype)
    eye = jnp.eye(m, dtype=dtype)
    # For the identity slack basis, solve() reduces to I (exact). XLA folds
    # this at runtime only if B happens to be I; cost is one O(m^3) solve at
    # init — matching the reference's one-off init phase, not the pivot loop.
    B_inv = jnp.linalg.solve(B, eye)
    c_b = jnp.take(prob.c, basis0).astype(dtype)
    at_upper = _at_upper_extras(prob, at_upper0)
    b_eff = prob.b.astype(dtype)
    if prob.u is not None:
        x_N = nonbasic_upper_values(prob, at_upper, dtype)
        b_eff = b_eff - _xk.matvec(prob.A, x_N)
    x_b = B_inv @ b_eff
    y = c_b @ B_inv
    zero = jnp.int32(0)
    e, gamma = _pricing_extras(prob, y, dtype, pricing, B_inv=B_inv)
    U, R, npend = _defer_extras(m, dtype, update_defer)
    return SolverState(
        B_inv=B_inv,
        x_b=x_b,
        y=y,
        c_b=c_b,
        basis=basis0,
        iters=zero,
        status=jnp.int32(SolveStatus.RUNNING),
        degen=zero,
        last_refac=zero,
        e=e,
        gamma=gamma,
        U=U,
        R=R,
        npend=npend,
        at_upper=at_upper,
        cand=_cand_extras(m, n, dtype, multi_price),
        pert=_pert_extras(m, dtype, perturb),
    )


def initial_state_slack(
    prob: Problem,
    dtype,
    pricing: str = "dantzig",
    update_defer: int = 0,
    at_upper0=None,
    multi_price: int = 0,
    perturb: bool = False,
) -> SolverState:
    """Fast path for the canonical trailing-identity slack basis.

    Avoids the O(m^3) solve of :func:`initial_state`; exactly the reference's
    init (``B_inv = I``, ``c_b = c[n-m:]``, ``x_b = b``, ``b_ixs = n-m+j`` —
    ``src/v4_cub_reduction.cu:272-277``).
    """
    m, n = prob.A.shape
    basis0 = jnp.arange(n - m, n, dtype=jnp.int32)
    c_b = prob.c[n - m :].astype(dtype)
    zero = jnp.int32(0)
    e, gamma = _pricing_extras(prob, c_b, dtype, pricing)
    U, R, npend = _defer_extras(m, dtype, update_defer)
    at_upper = _at_upper_extras(prob, at_upper0)
    x_b = prob.b.astype(dtype)
    if prob.u is not None:
        from simplex_tpu.kernels import xla as _xk

        x_N = nonbasic_upper_values(prob, at_upper, dtype)
        x_b = x_b - _xk.matvec(prob.A, x_N)
    return SolverState(
        B_inv=jnp.eye(m, dtype=dtype),
        x_b=x_b,
        y=c_b,
        c_b=c_b,
        basis=basis0,
        iters=zero,
        status=jnp.int32(SolveStatus.RUNNING),
        degen=zero,
        last_refac=zero,
        e=e,
        gamma=gamma,
        U=U,
        R=R,
        npend=npend,
        at_upper=at_upper,
        cand=_cand_extras(m, n, dtype, multi_price),
        pert=_pert_extras(m, dtype, perturb),
    )
