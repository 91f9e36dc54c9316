"""Solver configuration.

The reference hard-codes its knobs as ``constexpr`` (``BS_1D/BS_2D/EPS/
MAX_ITER``, ``src/v1_baseline.cu:15-18``) and a compile-time ``#define PRINT``
(``:20``). Here every tolerance and policy is a field of a frozen (hashable)
dataclass so it can be a static argument to ``jax.jit`` — one compiled
executable per option set, zero runtime branching cost.

Notable deviations from the reference (deliberate, see SURVEY.md §7):
  * ``max_iter`` defaults to a real bound, not the debug leftover ``5``.
  * ``pivot_tol`` replaces the exact ``alpha > 0`` test of ``compute_theta``
    (``src/v1_baseline.cu:219-228``) — tiny positive pivots explode ``1/α_q``
    in fp32; the reference's README lists this as an open TODO.
  * ``refactor_every`` adds periodic re-inversion of the true basis to stop
    fp32 drift in the product-form B_inv (reference has no mitigation).
  * ``bland_after`` switches pricing to Bland's rule after that many
    consecutive degenerate pivots, guaranteeing termination (the reference
    would cycle; MAX_ITER=5 hid this).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class SimplexOptions:
    """Static options for the simplex solver (hashable -> jit-static)."""

    # Optimality tolerance on reduced costs. Reference: EPS = 1e-4f
    # (src/v1_baseline.cu:17), used as `min_val >= -EPS` (v4 :299).
    eps: float = 1e-6

    # Ratio-test pivot tolerance: a column entry must exceed this to be an
    # eligible pivot. Reference used exact `alpha > 0`.
    pivot_tol: float = 1e-7

    # Pivot limit. 0 means "auto": 50 * (m + n) chosen at trace time.
    max_iter: int = 0

    # Re-invert the true basis every K pivots (0 = never). Amortized O(m^3/K).
    refactor_every: int = 0

    # After this many consecutive degenerate pivots (theta ~ 0), switch the
    # pricing rule to Bland's (smallest eligible index) until progress
    # resumes. 0 disables the fallback.
    bland_after: int = 64

    # Degenerate-step threshold on theta.
    degen_tol: float = 1e-9

    # Core arithmetic dtype for A / B_inv / vectors.
    dtype: jnp.dtype = jnp.float32

    # Kernel backend for the hot ops: "xla" (pure jnp, let XLA fuse) or
    # "pallas" (hand-written TPU kernels in simplex_tpu.kernels).
    backend: str = "xla"

    # Checkpoint the solver state every K pivots into a host-side store
    # (0 = never). Used by simplex_tpu.core.checkpoint.
    checkpoint_every: int = 0

    def resolve_max_iter(self, m: int, n: int) -> int:
        return self.max_iter if self.max_iter > 0 else 50 * (m + n)


DEFAULT_OPTIONS = SimplexOptions()
