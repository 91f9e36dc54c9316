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


def _newton_loop(B, X0, Y0, r0, eye, max_iter):
    dtype = B.dtype

    def cond(carry):
        _, _, resid, _, _, it = carry
        return jnp.logical_and(
            jnp.logical_and(resid > 16 * jnp.finfo(dtype).eps, resid < prev_of(carry)),
            it < max_iter,
        )

    def prev_of(carry):
        return carry[4]

    def body(carry):
        X, Y, resid, _, _, it = carry
        X1 = jnp.matmul(X, 2 * eye - Y, precision=_EXACT)
        Y1 = jnp.matmul(B, X1, precision=_EXACT)
        # keep the best iterate: the loop exits when a step makes the
        # residual worse, and the caller must get the iterate matching the
        # residual it is told about
        r1 = jnp.max(jnp.abs(Y1 - eye))
        return X1, Y1, r1, X, resid, it + 1

    X, _, resid, X_prev, prev, _ = jax.lax.while_loop(
        cond,
        body,
        (X0, Y0, r0, X0, jnp.asarray(jnp.inf, dtype), jnp.int32(0)),
    )
    worse = resid >= prev
    best = jnp.where(worse, X_prev, X)
    return best, jnp.minimum(resid, prev)


@functools.partial(jax.jit, static_argnames=("max_iter",))
def inverse_newton(B: jnp.ndarray, seed=None, max_iter: int = 100):
    """Return (X ~= inv(B), final residual ||I - B X||_max).

    ``seed``: an approximate inverse to refine (e.g. the solver's drifted
    product-form B_inv — 1-2 iterations to the fp floor). If the seed does
    not contract (residual >= 0.5, or a non-finite seed), restarts from the
    Pan-Schreiber scaling, which contracts for any nonsingular B. Stops at
    the fp floor, on a non-improving residual, or after ``max_iter``
    iterations; a residual that never contracts (singular B) is reported to
    the caller, not raised.
    """
    m = B.shape[0]
    dtype = B.dtype
    eye = jnp.eye(m, dtype=dtype)
    norm1 = jnp.max(jnp.sum(jnp.abs(B), axis=0))
    norminf = jnp.max(jnp.sum(jnp.abs(B), axis=1))
    scale = jnp.maximum(norm1 * norminf, jnp.finfo(dtype).tiny)
    Xs = B.T / scale

    if seed is None:
        X0 = Xs
        Y0 = jnp.matmul(B, X0, precision=_EXACT)
        r0 = jnp.max(jnp.abs(Y0 - eye))
    else:
        Yd = jnp.matmul(B, seed, precision=_EXACT)
        rd = jnp.max(jnp.abs(Yd - eye))
        use_seed = jnp.logical_and(jnp.isfinite(rd), rd < 0.5)

        def from_seed(_):
            return seed, Yd, rd

        def from_scratch(_):
            Ys = jnp.matmul(B, Xs, precision=_EXACT)
            return Xs, Ys, jnp.max(jnp.abs(Ys - eye))

        X0, Y0, r0 = jax.lax.cond(use_seed, from_seed, from_scratch, None)

    return _newton_loop(B, X0, Y0, r0, eye, max_iter)


def inverse_newton_hostloop(B_np, dtype, iters_per_dispatch: int = 2,
                            max_dispatches: int = 40):
    """From-scratch Newton inversion driven from the host in short dispatches.

    Same math as :func:`inverse_newton`, but each device dispatch runs only
    ``iters_per_dispatch`` iterations (~2 GEMMs) — long single dispatches
    (minutes of continuous MXU at m=16k) are where flaky workers die, and a
    host-side loop loses at most one short dispatch to a crash. Used by
    checkpoint resume; the in-loop solver refactorization keeps the fused
    while_loop version.
    """
    import numpy as np

    B = jnp.asarray(B_np, dtype)
    m = B.shape[0]

    @jax.jit
    def _start(B):
        eye = jnp.eye(m, dtype=dtype)
        norm1 = jnp.max(jnp.sum(jnp.abs(B), axis=0))
        norminf = jnp.max(jnp.sum(jnp.abs(B), axis=1))
        X = B.T / jnp.maximum(norm1 * norminf, jnp.finfo(dtype).tiny)
        Y = jnp.matmul(B, X, precision=_EXACT)
        return X, jnp.max(jnp.abs(Y - eye))

    @jax.jit
    def _steps(B, X):
        eye = jnp.eye(m, dtype=dtype)
        for _ in range(iters_per_dispatch):
            Y = jnp.matmul(B, X, precision=_EXACT)
            X = jnp.matmul(X, 2 * eye - Y, precision=_EXACT)
        Y = jnp.matmul(B, X, precision=_EXACT)
        return X, jnp.max(jnp.abs(Y - eye))

    X, resid = _start(B)
    prev = float("inf")
    r = float(resid)
    X_best, r_best = X, r
    for _ in range(max_dispatches):
        if r <= 16 * float(jnp.finfo(dtype).eps) or r >= prev:
            break
        X, resid = _steps(B, X)
        prev, r = r, float(resid)
        if r < r_best:
            X_best, r_best = X, r
    return np.asarray(X_best), r_best
