"""Device-side dense inversion without LU.

TPU LU (``jnp.linalg.solve``'s LuDecompositionBlock custom call) exceeds the
v5e scoped-VMEM limit at m=16384 and faults the worker inside nested control
flow at any size — so the framework inverts with Newton-Schulz iteration
instead: pure MXU GEMMs, compilable anywhere, and quadratically convergent.

Two regimes:
  * refinement (core.step.refactorize): seeded with the drifted product-form
    inverse — 2 iterations to the fp floor;
  * from scratch (checkpoint resume): seeded with the Pan-Schreiber scaling
    ``X0 = B.T / (||B||_1 ||B||_inf)``, which contracts for ANY nonsingular
    B (residual 1 - sigma_min^2/(||B||_1 ||B||_inf) < 1); iterations ~
    log2(cond(B)) + ~6.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_EXACT = jax.lax.Precision.HIGHEST


@functools.partial(jax.jit, static_argnames=("max_iter",))
def inverse_newton(B: jnp.ndarray, max_iter: int = 100):
    """Return (X ~= inv(B), final residual ||I - B X||_max).

    Stops when the residual stops improving (fp floor) or after ``max_iter``
    iterations. A residual that never contracts (singular B) is reported to
    the caller, not raised.
    """
    m = B.shape[0]
    dtype = B.dtype
    eye = jnp.eye(m, dtype=dtype)
    norm1 = jnp.max(jnp.sum(jnp.abs(B), axis=0))
    norminf = jnp.max(jnp.sum(jnp.abs(B), axis=1))
    scale = jnp.maximum(norm1 * norminf, jnp.finfo(dtype).tiny)
    X0 = B.T / scale
    Y0 = jnp.matmul(B, X0, precision=_EXACT)
    r0 = jnp.max(jnp.abs(Y0 - eye))

    def cond(carry):
        _, _, resid, prev, it = carry
        return jnp.logical_and(
            jnp.logical_and(resid > 16 * jnp.finfo(dtype).eps, resid < prev),
            it < max_iter,
        )

    def body(carry):
        X, Y, resid, _, it = carry
        X1 = jnp.matmul(X, 2 * eye - Y, precision=_EXACT)
        Y1 = jnp.matmul(B, X1, precision=_EXACT)
        return X1, Y1, jnp.max(jnp.abs(Y1 - eye)), resid, it + 1

    X, _, resid, prev, _ = jax.lax.while_loop(
        cond, body, (X0, Y0, r0, jnp.asarray(jnp.inf, dtype), jnp.int32(0))
    )
    return X, jnp.minimum(resid, prev)
