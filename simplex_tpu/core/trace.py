"""Per-pivot trace mode: the reference's compile-time ``#define PRINT``
(``src/v1_baseline.cu:20,105-148``: dump y, e, alpha, theta, B_inv, c_b,
b_ixs, x_b every iteration) rebuilt as a runtime debug driver.

Instead of a compile-time switch inside the hot loop (which would force host
syncs per pivot), tracing runs the SAME jitted pivot step from a host loop
and reports each transition — use it on small instances to hand-verify a
pivot path against a textbook trace, or to diff two backends' paths
(SURVEY.md §4: 'per-pivot trace comparison').
"""

from __future__ import annotations

import dataclasses
import sys
from typing import Iterator, List, Optional, TextIO

import jax
import jax.numpy as jnp
import numpy as np

from simplex_tpu.config import DEFAULT_OPTIONS, SimplexOptions
from simplex_tpu.core.state import Problem, initial_state_slack
from simplex_tpu.core.step import pivot_step
from simplex_tpu.kernels.dispatch import get_backend
from simplex_tpu.status import SolveStatus


@dataclasses.dataclass
class PivotRecord:
    iteration: int
    entering: int  # column p entering the basis (-1 once terminal)
    leaving_row: int  # row q whose variable leaves (-1 once terminal)
    leaving: int  # column index that left the basis (-1 once terminal)
    min_reduced_cost: float
    theta: float
    objective: float
    status: SolveStatus
    basis: np.ndarray
    x_b: np.ndarray


def trace_pivots(
    A,
    b,
    c,
    *,
    basis0=None,
    options: SimplexOptions = DEFAULT_OPTIONS,
    max_iter: Optional[int] = None,
    dual: bool = False,
) -> Iterator[PivotRecord]:
    """Yield one PivotRecord per pivot until termination.

    ``dual=True`` traces the DUAL pivot loop from ``basis0`` (a
    dual-feasible basis, e.g. a prior optimum under a changed b): the
    executed transition is derived identically (basis diff), with
    ``min_reduced_cost`` then reporting the pre-pivot MAX PRIMAL VIOLATION
    (the dual loop's progress measure) and ``theta`` the entering
    variable's new value. Terminal status OPTIMAL means primal
    feasibility reached (hand the basis to the primal loop for the
    certified optimum — that is what solve_dual does)."""
    from simplex_tpu import sparse as _bsp

    if isinstance(A, _bsp.BlockSparse):
        pass  # every traced op below dispatches on tiles already
    else:
        import scipy.sparse as _sps

        if _sps.issparse(A):
            # honor the requested dtype: an f64 trace of scipy input must
            # not run on silently f32-truncated tiles
            A = _bsp.from_scipy(A, dtype=options.dtype)
        else:
            A = jnp.asarray(A)
    if isinstance(A, _bsp.BlockSparse):
        if options.backend != "xla":
            raise NotImplementedError("sparse A requires backend='xla'")
        if options.partial_pricing > 1:
            # a trace must run the REQUESTED pricing path; silently
            # degrading to the full pass would trace a different solve
            raise NotImplementedError(
                "segmented pricing slices dense column ranges; trace "
                "sparse A with partial_pricing=0"
            )
    b = jnp.asarray(b)
    c = jnp.asarray(c)
    m, n = A.shape
    # Trace reporting reads state.B_inv directly for its alpha recompute, so
    # run the traced solve with eager updates (deferred mode would leave
    # B_inv stale between flushes; pivot paths are identical either way up to
    # fp reassociation, which is exactly what a trace wants pinned down).
    if options.update_defer or options.multi_price:
        # multi_price is likewise neutralized: the trace state carries no
        # candidate buffer (it would change the pivot PATH, not just fp
        # association — a multi-price trace reports the single-candidate
        # walk of the same pricing rule)
        options = dataclasses.replace(options, update_defer=0, multi_price=0)
    dtype = options.dtype
    prob = Problem(A.astype(dtype), b.astype(dtype), c.astype(dtype))
    backend = get_backend(options.backend)
    if basis0 is None:
        state = initial_state_slack(prob, dtype, options.pricing)
    else:
        from simplex_tpu.core.state import initial_state

        state = initial_state(
            prob, jnp.asarray(basis0, jnp.int32), dtype, options.pricing
        )
    limit = max_iter if max_iter is not None else options.resolve_max_iter(m, n)
    eps_f = options.resolve_eps()
    # (no donation: the initial state aliases y and c_b to the same buffer)
    if dual:
        from simplex_tpu.core.dual import dual_pivot_step

        step = jax.jit(lambda s: dual_pivot_step(prob, s, options, backend))
    else:
        step = jax.jit(lambda s: pivot_step(prob, s, options, backend))

    from simplex_tpu.kernels import xla as _xla

    for it in range(limit):
        prev_basis = np.asarray(state.basis)
        prev_y = state.y
        prev_x_b = state.x_b
        state = step(state)
        status = SolveStatus(int(state.status))
        terminal = status != SolveStatus.RUNNING

        # Derive the EXECUTED pivot from the basis transition — faithful for
        # every pricing configuration (bf16 shadow, partial pricing, devex:
        # they may pick a different improving column than full Dantzig).
        # The reported min_reduced_cost is the exact masked Dantzig bound
        # from the pre-pivot duals (the step's own optimality criterion).
        new_basis = np.asarray(state.basis)
        changed = np.nonzero(new_basis != prev_basis)[0]
        if len(changed) and not terminal:
            q = int(changed[0])
            p = int(new_basis[q])
            leaving = int(prev_basis[q])
            theta = float(np.asarray(state.x_b)[q])  # x_b_new[q] = theta
        else:
            q = p = leaving = -1
            theta = float("nan")
        if dual:
            # the dual loop's progress measure: worst primal violation of
            # the PRE-pivot point (monotone toward feasibility)
            min_e = float(np.max(np.maximum(-np.asarray(prev_x_b), 0)))
        else:
            c_eff = _xla.mask_basic(prob.c, jnp.asarray(prev_basis))
            _, min_e = backend.choose_entering(
                prev_y, prob.A, c_eff, eps_f, jnp.asarray(False)
            )
        rec = PivotRecord(
            iteration=it + 1,
            entering=p,
            leaving_row=q,
            leaving=leaving,
            min_reduced_cost=float(min_e),
            theta=theta,
            objective=float(jnp.dot(state.c_b, state.x_b)),
            status=status,
            basis=new_basis,
            x_b=np.asarray(state.x_b),
        )
        yield rec
        if terminal:
            return


def print_trace(
    A, b, c, *, file: TextIO = sys.stdout, verbose: bool = False, **kwargs
) -> List[PivotRecord]:
    """Print a human-readable pivot trace (the PRINT-mode report)."""
    records = []
    for r in trace_pivots(A, b, c, **kwargs):
        print(f"# Iteration {r.iteration}", file=file)
        if r.status == SolveStatus.RUNNING or r.entering >= 0:
            print(
                f"\tentering x_{r.entering}  leaving x_{r.leaving} (row {r.leaving_row})"
                f"  min_e={r.min_reduced_cost:+.6g}  theta={r.theta:.6g}"
                f"  z={r.objective:.6g}",
                file=file,
            )
        if verbose:
            print(f"\tbasis: {r.basis.tolist()}", file=file)
            print(f"\tx_b:   {np.round(r.x_b, 4).tolist()}", file=file)
        if r.status != SolveStatus.RUNNING:
            print(f"-> {r.status.describe()}", file=file)
        records.append(r)
    return records
