"""Checkpoint / resume for long solves.

The reference has none (SURVEY.md §5: solver state is ephemeral device
memory). Here the full solver state is one pytree
``{B_inv, x_b, y, c_b, basis, iters, status, degen}``, so checkpointing is a
host snapshot of those leaves: the solve runs in pivot chunks inside the same
jitted executable (the chunk budget is a traced scalar — no retraces), with a
snapshot written between chunks.

Resume validates the snapshot against the problem (basis in range, primal
feasibility) and optionally refactorizes B_inv from the true basis, so a
checkpoint taken on one machine/dtype restarts cleanly on another.
"""

from __future__ import annotations

import functools
import os
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from simplex_tpu.config import DEFAULT_OPTIONS, SimplexOptions
from simplex_tpu.core.solver import SolveResult, solve_state
from simplex_tpu.core.state import (
    Problem,
    SolverState,
    initial_state_slack,
    with_pricing_shadow,
)
from simplex_tpu.core.step import refactorize
from simplex_tpu.kernels.dispatch import get_backend
from simplex_tpu.logging import fields, get_logger
from simplex_tpu.status import SolveStatus

_log = get_logger("checkpoint")

_FIELDS = (
    "B_inv", "x_b", "y", "c_b", "basis", "iters", "status", "degen",
    "last_refac", "e", "gamma", "U", "R", "npend",
)


_LIGHT_SKIP = ("B_inv", "U", "R")


def _exact_inverse(A_basis: np.ndarray, dtype) -> np.ndarray:
    """inv(A[:, basis]) for light-checkpoint resume.

    On an accelerator backend, scaled Newton-Schulz iteration (pure GEMMs on
    the MXU; seeded with B.T / (||B||_1 ||B||_inf), which guarantees
    contraction for any nonsingular B). TPU LU is not an option at scale:
    the LuDecompositionBlock custom call exceeds the v5e scoped-VMEM limit
    at m=16384. The host fallback is float64 numpy — correct anywhere but
    O(m^3) on what may be a single core, so only used without an
    accelerator.
    """
    if jax.default_backend() != "cpu":
        from simplex_tpu.core.linalg import inverse_newton_hostloop

        X, resid = inverse_newton_hostloop(A_basis, dtype)
        if resid < 1e-3:
            return X
        # pathologically conditioned basis: fall back to host LAPACK
    return np.linalg.inv(np.asarray(A_basis, np.float64)).astype(dtype)


def save_checkpoint(
    path: str | os.PathLike, state: SolverState, light: bool = False
) -> None:
    """Snapshot the solver state.

    ``light=True`` omits the O(m^2) leaves (B_inv and the deferred-update
    buffers) — the combinatorial state (basis) plus the O(m)/O(n) vectors
    fully determine the solve, and resume rebuilds the exact inverse on the
    host. At m=16384 this cuts the device->host pull from ~1.3 GB to ~KBs
    per chunk (the tunnel transfer otherwise dominates chunked solves).
    """
    fields = _FIELDS if not light else tuple(
        f for f in _FIELDS if f not in _LIGHT_SKIP
    )
    if state.at_upper is not None:  # bounded-variable solve: flags are part
        fields = fields + ("at_upper",)  # of the combinatorial state
    host = jax.device_get({f: getattr(state, f) for f in fields})
    arrays = {f: np.asarray(v) for f, v in host.items()}
    if light:
        # remember the deferred-buffer shape so resume can re-create dummies
        arrays["_defer_shape"] = np.asarray(state.U.shape, np.int64)
    # write to a file object: np.savez(path) silently appends '.npz' to
    # extension-less paths, which would break resume's os.path.exists(path)
    with open(path, "wb") as f:
        np.savez(f, **arrays)


def load_checkpoint(
    path: str | os.PathLike, A=None, b=None, c=None
) -> SolverState:
    """Load a snapshot. Light checkpoints (no B_inv) need ``A`` to rebuild
    the exact basis inverse on the host (float64 LU, cast back to the solve
    dtype); ``b`` / ``c`` additionally re-derive x_b and the devex
    incremental reduced costs exactly when given."""
    with np.load(path) as data:
        at_upper = (
            jnp.asarray(data["at_upper"]) if "at_upper" in data else None
        )
        if "B_inv" in data:
            return SolverState(
                **{f: jnp.asarray(data[f]) for f in _FIELDS},
                at_upper=at_upper,
            )
        if A is None:
            raise ValueError(
                "light checkpoint (no B_inv): pass A to load_checkpoint so "
                "the basis inverse can be rebuilt"
            )
        fields = {
            f: np.asarray(data[f]) for f in _FIELDS if f not in _LIGHT_SKIP
        }
        shape = tuple(int(x) for x in data["_defer_shape"])
        basis = fields["basis"]
        dtype = fields["x_b"].dtype
        from simplex_tpu.core.solver import _host_basis_cols

        AB = _host_basis_cols(A, basis)
        if not isinstance(AB, np.ndarray):
            AB = AB.toarray()  # scipy.sparse column slice
        B_inv = _exact_inverse(AB, dtype)
        fields["B_inv"] = B_inv
        fields["y"] = (
            fields["c_b"].astype(np.float64) @ B_inv.astype(np.float64)
        ).astype(dtype)
        if b is not None:
            # true basic solution — never clamped (see core/step.refactorize).
            # Bounded solves: the basic block solves against the EFFECTIVE
            # rhs b - A x_N (nonbasic-at-upper columns parked at u), but u is
            # not stored in the snapshot — the caller's resume path
            # (solve_with_checkpoints) passes at_upper0 through solve()
            # instead, so only re-derive here for the classic x_N = 0 case.
            if at_upper is None:
                x = B_inv.astype(np.float64) @ np.asarray(b, np.float64)
                fields["x_b"] = x.astype(dtype)
        if c is not None and fields["e"].shape[0] == A.shape[1]:
            # devex: re-derive the incremental reduced costs from the exact y
            from simplex_tpu import sparse as _bsp

            if isinstance(A, _bsp.BlockSparse):
                # fp32 tile rmatvec (no dense f64 A exists); fine for the
                # incremental e — every pivot exact-rechecks its winner and
                # refactorize re-derives e exactly on cadence
                ya = np.asarray(
                    _bsp.rmatvec(A, jnp.asarray(fields["y"])), np.float64
                )
            else:
                import scipy.sparse as _sps

                if _sps.issparse(A):
                    # f64 vec @ scipy stays f64 and returns a dense ndarray
                    ya = np.asarray(
                        fields["y"].astype(np.float64) @ A, np.float64
                    ).ravel()
                else:
                    ya = fields["y"].astype(np.float64) @ np.asarray(
                        A, np.float64
                    )
            fields["e"] = (ya - np.asarray(c, np.float64)).astype(dtype)
        fields["last_refac"] = fields["iters"]
        return SolverState(
            U=jnp.zeros(shape, dtype),
            R=jnp.zeros(shape, dtype),
            **{f: jnp.asarray(v) for f, v in fields.items() if f != "npend"},
            npend=jnp.int32(0),
            at_upper=at_upper,
        )


def validate_checkpoint(state: SolverState, A, b, tol: float = 1e-3) -> None:
    """Fail fast on a corrupt / mismatched snapshot before resuming."""
    m, n = A.shape
    basis = np.asarray(state.basis)
    if state.B_inv.shape != (m, m):
        raise ValueError(
            f"checkpoint B_inv shape {state.B_inv.shape} != problem ({m}, {m})"
        )
    if basis.min() < 0 or basis.max() >= n:
        raise ValueError("checkpoint basis indices out of range")
    if len(np.unique(basis)) != m:
        raise ValueError("checkpoint basis has duplicate columns")
    x_b = np.asarray(state.x_b)
    if np.any(x_b < -tol):
        raise ValueError("checkpoint primal values are infeasible")
    from simplex_tpu.core.solver import _host_basis_cols

    resid = _host_basis_cols(A, basis) @ x_b - np.asarray(b)
    scale = max(1.0, float(np.abs(b).max()))
    if np.abs(resid).max() > tol * scale:
        raise ValueError(
            f"checkpoint does not satisfy A_B x_b = b (residual "
            f"{np.abs(resid).max():.2e})"
        )


@functools.partial(jax.jit, static_argnames=("opts",))
def _chunk_jit(A, b, c, state, opts: SimplexOptions, limit):
    prob = Problem(
        A.astype(opts.dtype), b.astype(opts.dtype), c.astype(opts.dtype)
    )
    prob = with_pricing_shadow(prob, opts.pricing_dtype, opts.pricing)
    return solve_state(prob, state, opts, limit)


@functools.partial(jax.jit, static_argnames=("opts",))
def _drop_pert_jit(A, b, c, state, opts: SimplexOptions):
    """Clear an active anti-degeneracy shift before a snapshot.

    A chunk can exhaust its pivot budget mid-perturbation; the snapshot
    format does not carry the shift record (``PertState``), so saving the
    perturbed ``x_b`` would break the ``A_B x_b = b`` invariant the resume
    validation checks. Clear the shift and re-derive x_b / y from the TRUE
    rhs (O(m^2), chunk cadence) so every snapshot is unperturbed by
    construction; the resumed solve re-arms on its next degenerate streak.
    """
    from simplex_tpu.core.step import perturb_clear, recompute_xy

    prob = Problem(
        A.astype(opts.dtype), b.astype(opts.dtype), c.astype(opts.dtype)
    )
    state = perturb_clear(state)
    return recompute_xy(prob, state, opts.resolve_defer() > 0)


def solve_with_checkpoints(
    A,
    b,
    c,
    *,
    path: str | os.PathLike,
    basis0: Optional[np.ndarray] = None,
    options: SimplexOptions = DEFAULT_OPTIONS,
    resume: bool = True,
    on_chunk: Optional[Callable[[SolverState], None]] = None,
    max_retries: int = 3,
    A_host: Optional[np.ndarray] = None,
) -> SolveResult:
    """Solve with periodic host checkpoints (every ``options.checkpoint_every``
    pivots, default 1024). If ``resume`` and ``path`` exists, continue from it.

    ``A_host``: optional host copy of ``A`` for callers that pass a DEVICE
    array. The final polish reads A's basis columns on the host; without a
    host copy it falls back to ``np.asarray(A)``, which drags the whole
    matrix back through the tunneled runtime — measured 3.5-15 s (!) of the
    "solve" wall clock at m=8192 (round-5 dissection), run-to-run variable.
    """
    from simplex_tpu import sparse as _bsp

    if A_host is None:
        A_host = A if isinstance(A, np.ndarray) else None  # see solver.solve
    is_sparse = isinstance(A, _bsp.BlockSparse)
    if not is_sparse:
        import scipy.sparse as _sps

        if _sps.issparse(A):
            # scipy input, as in solver.solve: tiles on device, scipy kept
            # for the host-side gathers (resume inverse, validation, polish)
            A_host = A.tocsc()
            A = _bsp.from_scipy(A_host, dtype=options.dtype)
            is_sparse = True
    if not is_sparse:
        A = jnp.asarray(A)
    b = jnp.asarray(b)
    c = jnp.asarray(c)
    m, n = A.shape
    chunk = options.checkpoint_every if options.checkpoint_every > 0 else 1024
    max_iter = options.resolve_max_iter(m, n)
    path = os.fspath(path)
    # Normalize fields that do NOT shape the compiled graph out of the
    # static jit key (the pivot budget is a TRACED scalar; checkpoint
    # cadence is host-side): otherwise a warmup run with a small max_iter
    # compiles a second, bitwise-identical executable for the real run —
    # measured as ~8 s of hidden recompile inside the first timed chunk.
    import dataclasses as _dc

    exec_options = _dc.replace(options, max_iter=0, checkpoint_every=0)

    if resume and os.path.exists(path):
        state = load_checkpoint(path, A=A, b=b, c=c)
        validate_checkpoint(state, A, b)
        state = state._replace(status=jnp.int32(SolveStatus.RUNNING))
        if options.multi_price > 0 and state.cand is None:
            # snapshots don't carry the (ephemeral) multiple-pricing buffer;
            # attach an empty one so the resumed chunks keep the fast path
            from simplex_tpu.core.state import _cand_extras

            state = state._replace(
                cand=_cand_extras(m, n, options.dtype, options.multi_price)
            )
        if options.perturb_after > 0 and state.pert is None:
            # snapshots don't carry the perturbation record either; resumes
            # restart unperturbed (x_b is re-derived from the TRUE rhs) and
            # the gate re-arms on the next degenerate streak
            from simplex_tpu.core.state import _pert_extras

            state = state._replace(
                pert=_pert_extras(m, options.dtype, True)
            )
        if int(state.last_refac) < int(state.iters):
            # full checkpoint carried a drifted inverse: refactorize so the
            # resumed solve starts clean (light ones are rebuilt exact).
            prob = Problem(
                A.astype(options.dtype),
                b.astype(options.dtype),
                c.astype(options.dtype),
            )
            state = refactorize(
                prob,
                state,
                get_backend(options.backend),
                options.pricing,
                options.resolve_defer() > 0,
            )
    else:
        prob = Problem(
            A.astype(options.dtype),
            b.astype(options.dtype),
            c.astype(options.dtype),
        )
        if basis0 is not None:
            from simplex_tpu.core.state import initial_state

            state = initial_state(
                prob,
                jnp.asarray(basis0, jnp.int32),
                options.dtype,
                options.pricing,
                options.resolve_defer(),
                multi_price=options.multi_price,
                perturb=options.perturb_after > 0,
            )
        else:
            state = initial_state_slack(
                prob, options.dtype, options.pricing, options.resolve_defer(),
                multi_price=options.multi_price,
                perturb=options.perturb_after > 0,
            )

    retries = 0
    while True:
        limit = min(int(state.iters) + chunk, max_iter)
        try:
            state = _chunk_jit(A, b, c, state, exec_options, jnp.int32(limit))
            jax.block_until_ready(state.x_b)
            retries = 0
        except jax.errors.JaxRuntimeError as exc:
            # Elastic recovery: a device/worker crash loses the in-memory
            # state, but the last light checkpoint has everything needed.
            # (The reference's failure model is exit(1) on any error,
            # src/v1_baseline.cu:70-72.) If the runtime cannot recover
            # in-process, re-running the same command resumes from the same
            # checkpoint file.
            if "UNAVAILABLE" not in str(exc) or retries >= max_retries:
                raise
            retries += 1
            _log.warning(
                "device unavailable; recovering from checkpoint",
                extra=fields(retry=retries, path=path),
            )
            import time as _time

            _time.sleep(10.0 * retries)
            if os.path.exists(path):
                state = load_checkpoint(path, A=A, b=b, c=c)
                validate_checkpoint(state, A, b)
                state = state._replace(status=jnp.int32(SolveStatus.RUNNING))
            else:
                # crashed before the first snapshot: restart from the same
                # start the initial call used — including a caller-supplied
                # basis0 (the slack basis may be infeasible for this problem)
                prob0 = Problem(
                    A.astype(options.dtype),
                    b.astype(options.dtype),
                    c.astype(options.dtype),
                )
                if basis0 is not None:
                    from simplex_tpu.core.state import initial_state

                    state = initial_state(
                        prob0,
                        jnp.asarray(basis0, jnp.int32),
                        options.dtype,
                        options.pricing,
                        options.resolve_defer(),
                        multi_price=options.multi_price,
                        perturb=options.perturb_after > 0,
                    )
                else:
                    state = initial_state_slack(
                        prob0, options.dtype, options.pricing,
                        options.resolve_defer(),
                        multi_price=options.multi_price,
                        perturb=options.perturb_after > 0,
                    )
            continue
        status = SolveStatus(int(state.status))
        done = status != SolveStatus.MAX_ITER or int(state.iters) >= max_iter
        # MAX_ITER from a chunk just means "budget exhausted, keep going"
        if status == SolveStatus.MAX_ITER and int(state.iters) < max_iter:
            state = state._replace(status=jnp.int32(SolveStatus.RUNNING))
        if state.pert is not None and bool(state.pert.on):
            # budget ran out mid-perturbation (verified terminals already
            # cleared it in-loop): un-shift before the snapshot
            state = _drop_pert_jit(A, b, c, state, exec_options)
        save_checkpoint(path, state, light=m >= 2048)
        _log.info(
            "chunk complete",
            extra=fields(iters=int(state.iters), status=status.name),
        )
        if on_chunk is not None:
            on_chunk(state)
        if done:
            break

    # selective host pull (B_inv stays on device — the full-state
    # device_get was measured at ~15-30 s of tunnel transfer at m=8192)
    x_b_np, basis_np, c_b_np, y_np = jax.device_get(
        (state.x_b, state.basis, state.c_b, state.y)
    )
    # Same exact-objective polish as solver.solve: O(m^2)-per-pass
    # iterative refinement reusing the solve's own inverse (NOT an O(m^3)
    # LU — that would put the round-1 single-core tail back inside
    # bench_full's timed window), so z is the objective of the TRUE basic
    # solution and feas_err its actual primal infeasibility.
    if options.polish and m <= options.polish_max_m:
        from simplex_tpu.core.solver import run_polish

        x_b64, ok = run_polish(A, A_host, b, basis_np, x_b_np, state.B_inv)
        if ok:
            feas_err = float(max(0.0, -x_b64.min()))
            x_b_np = x_b64.astype(x_b_np.dtype)
            z = float(np.asarray(c, np.float64)[basis_np] @ x_b64)
        else:
            z = float(np.dot(c_b_np, x_b_np))
            feas_err = float(max(0.0, -x_b_np.min()))
    else:
        z = float(np.dot(c_b_np, x_b_np))
        feas_err = float(max(0.0, -x_b_np.min()))
    x = np.zeros(n, dtype=x_b_np.dtype)
    x[basis_np] = x_b_np
    return SolveResult(
        z=z,
        x=x,
        x_b=x_b_np,
        basis=basis_np,
        status=SolveStatus(int(state.status)),
        iters=int(state.iters),
        feas_err=feas_err,
        y=y_np,
    )
