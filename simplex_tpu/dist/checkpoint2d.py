"""Chunked solves + checkpoint/elastic recovery for the 2-D sharded mode.

The single-chip path has had chunking + light snapshots + UNAVAILABLE
retry since round 1 (:mod:`simplex_tpu.core.checkpoint`), but the
32k-class instances that *must* run on the mesh had no elastic story
(round-2 verdict weak #5). This module closes that: the 2-D solve runs in
pivot chunks inside the same jitted executables (the budget is a traced
scalar — no retraces), a LIGHT snapshot (basis + counters, a few KB — the
row-sharded O(m^2/R) inverse never crosses the host boundary) is written
between chunks, and a device loss mid-chunk resumes from the snapshot by
rebuilding the inverse ON THE MESH with the existing distributed
Newton-Schulz refactorization (``sharded2d.refactorize_2d`` via the
"resume" entry of ``_build_2d_fn``).

Reference: none — the reference is single-GPU with exit(1)-on-error
(``src/v1_baseline.cu:70-72``; SURVEY.md §5 failure detection: none).
"""

from __future__ import annotations

import dataclasses
import os
import time as _time
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from simplex_tpu.config import DEFAULT_OPTIONS, SimplexOptions
from simplex_tpu.core.solver import SolveResult, finalize_result
from simplex_tpu.dist.sharded2d import COLS_AXIS, ROWS_AXIS, _build_2d_fn
from simplex_tpu.logging import fields, get_logger
from simplex_tpu.status import SolveStatus

_log = get_logger("dist.checkpoint2d")


def _run_chunk(fn, *args):
    """Indirection point so tests can inject device failures."""
    return fn(*args)


def save_light_snapshot(path, basis, iters, degen, status) -> None:
    """basis + counters fully determine the solve: resume rebuilds the
    row-sharded inverse and exact x_b / y on the mesh."""
    with open(path, "wb") as f:
        np.savez(
            f,
            basis=np.asarray(basis, np.int32),
            iters=np.int32(iters),
            degen=np.int32(degen),
            status=np.int32(status),
        )


def load_light_snapshot(path, m: int, n: int):
    """Load + validate a light 2-D snapshot; returns (basis, iters, degen)."""
    with np.load(path) as data:
        basis = np.asarray(data["basis"], np.int32)
        iters = int(data["iters"])
        degen = int(data["degen"])
    if basis.shape != (m,):
        raise ValueError(f"snapshot basis shape {basis.shape} != ({m},)")
    if basis.min() < 0 or basis.max() >= n:
        raise ValueError("snapshot basis indices out of range")
    if len(np.unique(basis)) != m:
        raise ValueError("snapshot basis has duplicate columns")
    return basis, iters, degen


def solve_sharded_2d_with_checkpoints(
    A,
    b,
    c,
    mesh: jax.sharding.Mesh,
    *,
    path: str | os.PathLike,
    basis0=None,
    options: SimplexOptions = DEFAULT_OPTIONS,
    resume: bool = True,
    on_chunk: Optional[Callable[[dict], None]] = None,
    max_retries: int = 3,
) -> SolveResult:
    """2-D sharded solve with periodic light checkpoints (every
    ``options.checkpoint_every`` pivots, default 1024) and UNAVAILABLE
    retry. If ``resume`` and ``path`` exists, continue from the snapshot.

    Chunk continuation keeps the full state (including the row-sharded
    inverse) device-resident — only the O(m) light fields are pulled per
    chunk — so steady-state throughput matches ``solve_sharded_2d``.
    """
    from simplex_tpu import sparse as _bsp

    A_host = None
    is_sparse = isinstance(A, _bsp.BlockSparse)
    R = mesh.shape[ROWS_AXIS]
    C = mesh.shape[COLS_AXIS]
    if not is_sparse:
        import scipy.sparse as _sps

        if _sps.issparse(A):
            from simplex_tpu.dist.sharded2d import _check_2d_shapes

            # validate the mesh divides the shapes BEFORE the O(nnz) tiling
            _check_2d_shapes(A.shape, mesh)
            A_host = A.tocsc()
            A = _bsp.tile_for_column_shards(
                A_host, R * C, dtype=options.dtype
            )
            is_sparse = True
    if not is_sparse:
        A = jnp.asarray(A)
    b = jnp.asarray(b)
    c = jnp.asarray(c)
    m, n = A.shape
    from simplex_tpu.dist.sharded2d import _check_2d_shapes as _chk

    _chk((m, n), mesh)
    m_loc, n_loc = m // R, n // (R * C)
    basis0_arr = (
        jnp.arange(n - m, n, dtype=jnp.int32)
        if basis0 is None
        else jnp.asarray(basis0, jnp.int32)
    )
    chunk = options.checkpoint_every if options.checkpoint_every > 0 else 1024
    max_iter = options.resolve_max_iter(m, n)
    path = os.fspath(path)
    exec_options = dataclasses.replace(options, max_iter=0, checkpoint_every=0)

    if is_sparse:
        A_args = _bsp.flat_shard_args(A, R * C)[:3]
    else:
        A_args = (A,)

    def build(kind):
        return _build_2d_fn(
            mesh, m, n, m_loc, n_loc, exec_options, kind, sparse=is_sparse
        )

    if resume and os.path.exists(path):
        snap_basis, snap_iters, snap_degen = load_light_snapshot(path, m, n)
        mode = "resume"
    else:
        mode = "start"
        snap_iters = 0

    state = None
    retries = 0
    while True:
        cur = snap_iters if state is None else int(state["iters"])
        limit = min(cur + chunk, max_iter)
        try:
            if mode == "start":
                state, _z = _run_chunk(
                    build("start"), *A_args, b, c, basis0_arr,
                    jnp.int32(limit),
                )
            elif mode == "resume":
                state, _z = _run_chunk(
                    build("resume"), *A_args, b, c,
                    jnp.asarray(snap_basis, jnp.int32),
                    jnp.int32(snap_iters), jnp.int32(snap_degen),
                    jnp.int32(limit),
                )
            else:  # cont: previous chunk's device state continues in place
                state = {**state, "status": jnp.int32(SolveStatus.RUNNING)}
                state, _z = _run_chunk(
                    build("cont"), *A_args, b, c, state, jnp.int32(limit)
                )
            jax.block_until_ready(state["x_b"])
            mode = "cont"
            retries = 0
        except jax.errors.JaxRuntimeError as exc:
            # Elastic recovery: a device/worker loss mid-chunk drops the
            # in-memory state, but the last light snapshot has everything
            # needed — the inverse is rebuilt on the (recovered) mesh.
            if "UNAVAILABLE" not in str(exc) or retries >= max_retries:
                raise
            retries += 1
            _log.warning(
                "device unavailable; recovering 2-D solve from checkpoint",
                extra=fields(retry=retries, path=path),
            )
            _time.sleep(10.0 * retries)
            state = None
            if os.path.exists(path):
                snap_basis, snap_iters, snap_degen = load_light_snapshot(
                    path, m, n
                )
                mode = "resume"
            else:
                # crashed before the first snapshot: restart from the same
                # start the initial call used (incl. caller basis0)
                mode = "start"
                snap_iters = 0
            continue
        status = SolveStatus(int(state["status"]))
        save_light_snapshot(
            path, jax.device_get(state["basis"]), int(state["iters"]),
            int(state["degen"]), int(state["status"]),
        )
        _log.info(
            "2-D chunk complete",
            extra=fields(iters=int(state["iters"]), status=status.name),
        )
        if on_chunk is not None:
            on_chunk(state)
        # MAX_ITER from a chunk just means "budget exhausted, keep going"
        if status != SolveStatus.MAX_ITER or int(state["iters"]) >= max_iter:
            break

    x_b_np, basis_np, c_b_np, y_np, status_i, iters_i = jax.device_get(
        (state["x_b"], state["basis"], state["c_b"], state["y"],
         state["status"], state["iters"])
    )
    return finalize_result(
        A, A_host, b, c, x_b_np, basis_np, c_b_np, y_np, status_i, iters_i,
        state["B_inv"], options,
    )
