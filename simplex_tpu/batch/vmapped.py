"""Batched solve: many independent LPs at once via ``vmap``.

The reference is strictly one-LP-per-process. BASELINE.json configs[3]
mandates "vmap-batched solve of 10k independent small LPs sharded across
chips" — scenario workloads where thousands of same-shape LPs (e.g.
perturbed right-hand sides) solve in parallel, one per MXU-friendly batch
lane.

Design: ``jax.vmap`` over :func:`solve_state`'s while_loop. JAX's batching
rule for ``while_loop`` runs until *all* instances terminate, applying the
body only where each instance's predicate still holds — and our pivot step is
additionally a fixed point on terminal states (tested in
tests/test_step.py::test_terminal_state_is_fixed_point), so finished LPs are
no-ops, not blockers (SURVEY.md §7 'batched while_loop divergence').

Sharding: pass a ``jax.sharding.Mesh`` (1-D, axis 'batch') to spread the
stacked LPs across chips — pure data parallelism, zero cross-chip
communication during the solve.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from simplex_tpu.config import DEFAULT_OPTIONS, SimplexOptions
from simplex_tpu.core.solver import solve_state
from simplex_tpu.core.state import Problem, initial_state_slack, with_pricing_shadow
from simplex_tpu.status import SolveStatus


class BatchSolveResult(NamedTuple):
    z: np.ndarray  # (B,)
    x_b: np.ndarray  # (B, m)
    basis: np.ndarray  # (B, m)
    status: np.ndarray  # (B,) int32
    iters: np.ndarray  # (B,) int32

    def statuses(self):
        return [SolveStatus(int(s)) for s in self.status]


@functools.partial(jax.jit, static_argnames=("opts", "max_iter"))
def _solve_batch_jit(As, bs, cs, opts: SimplexOptions, max_iter: int):
    dtype = opts.dtype

    def one(A, b, c):
        prob = Problem(A.astype(dtype), b.astype(dtype), c.astype(dtype))
        prob = with_pricing_shadow(prob, opts.pricing_dtype, opts.pricing)
        state0 = initial_state_slack(prob, dtype, opts.pricing, opts.update_defer)
        final = solve_state(prob, state0, opts, max_iter)
        z = jnp.dot(final.c_b, final.x_b)
        return z, final.x_b, final.basis, final.status, final.iters

    return jax.vmap(one)(As, bs, cs)


def solve_batched(
    As,
    bs,
    cs,
    *,
    options: SimplexOptions = DEFAULT_OPTIONS,
    mesh: Optional[jax.sharding.Mesh] = None,
    batch_axis: str = "batch",
) -> BatchSolveResult:
    """Solve a stack of same-shape LPs: As (B, m, n), bs (B, m), cs (B, n).

    All LPs must use the canonical trailing slack basis. With ``mesh``, the
    batch dimension is sharded across the mesh's ``batch_axis``.
    """
    As = jnp.asarray(As)
    bs = jnp.asarray(bs)
    cs = jnp.asarray(cs)
    if As.ndim != 3:
        raise ValueError(f"As must be (B, m, n), got {As.shape}")
    B, m, n = As.shape
    if mesh is not None:
        P = jax.sharding.PartitionSpec

        def shard(x, spec):
            return jax.device_put(x, jax.sharding.NamedSharding(mesh, spec))

        As = shard(As, P(batch_axis, None, None))
        bs = shard(bs, P(batch_axis, None))
        cs = shard(cs, P(batch_axis, None))
    max_iter = options.resolve_max_iter(m, n)
    z, x_b, basis, status, iters = jax.device_get(
        _solve_batch_jit(As, bs, cs, options, max_iter)
    )
    return BatchSolveResult(
        z=np.asarray(z),
        x_b=np.asarray(x_b),
        basis=np.asarray(basis),
        status=np.asarray(status),
        iters=np.asarray(iters),
    )
