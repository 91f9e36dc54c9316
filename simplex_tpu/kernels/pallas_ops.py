"""Hand-written TPU Mosaic (Pallas) kernels for the three hot ops.

Reference mapping (SURVEY.md §2 kernel table):
  pricing_scan   <- pricing GEMM + cub::DeviceReduce::ArgMin
                    (src/v4_cub_reduction.cu:289-302) — fused here: one pass
                    over A produces (min reduced cost, Dantzig argmin, first
                    negative index for Bland) without materializing e in HBM
  ratio_argmin   <- compute_theta + cub ArgMin (:313-325) — one fused masked
                    min-reduce, no atomics (the reference counts non-positive
                    alphas with atomicAdd)
  rank1_update   <- compute_E_q + cublasSger (:331-333) — tiled in-place
                    outer-product add, the north-star >=80%-of-roofline HBM
                    kernel

All kernels run in interpret mode off-TPU so the forced-CPU test suite
exercises them; shapes that don't tile cleanly fall back to the XLA backend
(same signatures, same semantics).

MEASURED VERDICT (round 2, v5e, 8192x16384 fp32): per-op the Pallas kernels
match or slightly beat XLA (serialized-scan bench: pricing 347 vs 336 GB/s,
rank-1 315 vs 309 GB/s), but END-TO-END inside the jitted pivot while_loop
the XLA backend is ~2x faster (470 vs 243 pivots/s, pure-Dantzig config
where both hot kernels run every pivot): XLA fuses and pipelines the
surrounding O(m)/scalar ops across the loop body, while pallas_call
boundaries are opaque to it. The XLA backend therefore stays the default;
these kernels remain as a correctness-tested alternative (exercised in
tests/test_kernels.py, selectable with backend="pallas") and as the scaffold
for any future op XLA's codegen leaves on the table. The full measured
pivot sustains ~630 GB/s of HBM traffic = ~77% of the v5e roofline across
ALL phases combined (BASELINE.md) — the reference-shaped per-pivot traffic
is already bandwidth-bound, which is why the flagship config wins by
AVOIDING bytes (bf16 shadow, partial pricing, deferred updates), not by a
faster kernel.
"""

from __future__ import annotations

import functools
import os
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from simplex_tpu.kernels import xla as _xla

INT_MAX = jnp.iinfo(jnp.int32).max


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _pick_tile(dim: int, target: int, align: int) -> int:
    """Largest divisor of ``dim`` that is <= target and a multiple of
    ``align``; 0 if none exists (caller falls back to XLA)."""
    t = min(target, dim)
    t -= t % align
    while t >= align:
        if dim % t == 0:
            return t
        t -= align
    return 0


# --------------------------------------------------------------------------
# Fused pricing + argmin
# --------------------------------------------------------------------------


def _pricing_kernel(
    y_ref, c_ref, A_ref, minval_ref, pmin_ref, pneg_ref, acc_ref, *, eps, tn, gm
):
    jn = pl.program_id(0)  # column-tile index (slow)
    im = pl.program_id(1)  # row-tile index (fast)

    @pl.when(jnp.logical_and(jn == 0, im == 0))
    def _init():
        minval_ref[0, 0] = jnp.asarray(jnp.inf, minval_ref.dtype)
        pmin_ref[0, 0] = jnp.int32(0)
        pneg_ref[0, 0] = INT_MAX

    @pl.when(im == 0)
    def _zero_acc():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # Partial reduced-cost accumulation for this column tile:
    # acc[1,TN] += sum_i y[i] * A[i, :]. Deliberately on the VPU (broadcast
    # multiply + sublane reduction), NOT the MXU: a 1-row matmul wastes
    # 127/128 of the systolic array, and the MXU's default bf16 passes lose
    # ~3 decimal digits, which keeps min_e below -eps forever at the optimum
    # (observed on v5e). Pricing is HBM-bound; the VPU does it at full f32.
    # A may be the bf16 pricing shadow — upcast per tile, accumulate f32.
    acc_ref[:] += jnp.sum(
        y_ref[:].astype(jnp.float32) * A_ref[:].astype(jnp.float32),
        axis=0,
        keepdims=True,
    )

    @pl.when(im == gm - 1)
    def _finish_tile():
        e = acc_ref[:] - c_ref[:].astype(jnp.float32)  # (1, TN)
        idx = jax.lax.broadcasted_iota(jnp.int32, e.shape, 1)
        local_min = jnp.min(e)
        local_arg = jnp.min(jnp.where(e == local_min, idx, INT_MAX))
        gbase = jn * tn

        @pl.when(local_min < minval_ref[0, 0])
        def _update_min():
            minval_ref[0, 0] = local_min
            pmin_ref[0, 0] = gbase + local_arg

        neg_first = jnp.min(jnp.where(e < -eps, idx, INT_MAX))

        @pl.when(jnp.logical_and(pneg_ref[0, 0] == INT_MAX, neg_first < INT_MAX))
        def _update_neg():
            pneg_ref[0, 0] = gbase + neg_first


@functools.partial(jax.jit, static_argnames=("eps",))
def pricing_scan(y: jnp.ndarray, A: jnp.ndarray, c: jnp.ndarray, eps: float):
    """One fused pass over A: returns (min_e, argmin_e, first index with
    e < -eps or INT_MAX). Reads each A tile exactly once; e never hits HBM."""
    m, n = A.shape
    sublane = 16 if A.dtype.itemsize == 2 else 8
    tm = _pick_tile(m, 512, sublane)
    tn = _pick_tile(n, 1024, 128)
    if tm == 0 or tn == 0:
        e = _xla.reduced_costs(y, A, c)
        idx = jnp.arange(n, dtype=jnp.int32)
        min_e = jnp.min(e)
        p = jnp.min(jnp.where(e == min_e, idx, INT_MAX))
        pneg = jnp.min(jnp.where(e < -eps, idx, INT_MAX))
        return min_e, p, pneg
    gm, gn = m // tm, n // tn

    kernel = functools.partial(_pricing_kernel, eps=eps, tn=tn, gm=gm)
    minval, pmin, pneg = pl.pallas_call(
        kernel,
        grid=(gn, gm),
        in_specs=[
            pl.BlockSpec((tm, 1), lambda jn, im: (im, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tn), lambda jn, im: (0, jn), memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, tn), lambda jn, im: (im, jn), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
        ],
        scratch_shapes=[pltpu.VMEM((1, tn), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * m * n, bytes_accessed=m * n * A.dtype.itemsize, transcendentals=0
        ),
        interpret=_interpret(),
    )(y.astype(jnp.float32).reshape(m, 1), c.astype(jnp.float32).reshape(1, n), A)
    return minval[0, 0], pmin[0, 0], pneg[0, 0]


def choose_entering(y, A, c, eps, use_bland) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Same contract as :func:`simplex_tpu.kernels.xla.choose_entering`."""
    min_e, p_dantzig, p_neg = pricing_scan(y, A, c, eps)
    p_bland = jnp.where(p_neg == INT_MAX, 0, p_neg)
    p = jnp.where(use_bland, p_bland, p_dantzig)
    return p.astype(jnp.int32), min_e


# --------------------------------------------------------------------------
# Masked ratio test
# --------------------------------------------------------------------------


def _ratio_kernel(
    xb_ref, alpha_ref, basis_ref, bland_ref, q_ref, theta_ref, unb_ref, *, pivot_tol
):
    alpha = alpha_ref[:]
    x_b = xb_ref[:]
    mask = alpha > pivot_tol
    inf = jnp.asarray(jnp.inf, x_b.dtype)
    theta = jnp.where(mask, jnp.maximum(x_b, 0) / jnp.where(mask, alpha, 1), inf)
    tmin = jnp.min(theta)
    idx = jax.lax.broadcasted_iota(jnp.int32, theta.shape, 1)
    q_plain = jnp.min(jnp.where(theta == tmin, idx, INT_MAX))
    # Bland's anti-cycling guarantee is proven for rows attaining the
    # EXACT minimum ratio; all theta here come from one expression, so exact
    # equality selects precisely the argmin tie set (a tolerance band could
    # admit a non-minimal row and break feasibility monotonicity).
    tie = theta == tmin
    big = jnp.where(tie, basis_ref[:], INT_MAX)
    bmin = jnp.min(big)
    q_bland = jnp.min(jnp.where(big == bmin, idx, INT_MAX))
    q = jnp.where(bland_ref[0, 0] != 0, q_bland, q_plain)
    unbounded = jnp.logical_not(jnp.any(mask))
    q_ref[0, 0] = jnp.where(q == INT_MAX, 0, q)
    theta_ref[0, 0] = jnp.where(unbounded, inf, tmin)
    unb_ref[0, 0] = unbounded.astype(jnp.int32)


def ratio_argmin(x_b, alpha, basis, pivot_tol, use_bland):
    """Same contract as :func:`simplex_tpu.kernels.xla.ratio_argmin`."""
    m = x_b.shape[0]
    if m % 128 != 0 or m > 64 * 1024:
        return _xla.ratio_argmin(x_b, alpha, basis, pivot_tol, use_bland)
    bland = use_bland.astype(jnp.int32).reshape(1, 1)
    q, theta_q, unb = pl.pallas_call(
        functools.partial(_ratio_kernel, pivot_tol=pivot_tol),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
            jax.ShapeDtypeStruct((1, 1), x_b.dtype),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
        ],
        interpret=_interpret(),
    )(x_b.reshape(1, m), alpha.reshape(1, m), basis.reshape(1, m), bland)
    return q[0, 0], theta_q[0, 0], unb[0, 0].astype(bool)


# --------------------------------------------------------------------------
# Fused ratio test + eta vector + x_b update (one dispatch for the post-ftran
# O(m) chain: the solver's per-pivot cost at small m is dominated by kernel
# dispatch latency, ~25-50us per op on the tunneled v5e)
# --------------------------------------------------------------------------


def _ratio_eta_kernel(
    xb_ref, alpha_ref, basis_ref, bland_ref,
    q_ref, theta_ref, unb_ref,
    eta_ref, xbnew_ref,
    *, pivot_tol, feas_tol, harris,
):
    alpha = alpha_ref[:]  # (1, m)
    x_b = xb_ref[:]
    dtype = x_b.dtype
    inf = jnp.asarray(jnp.inf, dtype)
    idx = jax.lax.broadcasted_iota(jnp.int32, alpha.shape, 1)

    mask = alpha > pivot_tol
    unbounded = jnp.logical_not(jnp.any(mask))
    x_pos = jnp.maximum(x_b, 0)
    safe = jnp.where(mask, alpha, 1)
    theta = jnp.where(mask, x_pos / safe, inf)
    tmin = jnp.min(theta)

    if harris:
        theta_rel = jnp.where(mask, (x_pos + feas_tol) / safe, inf)
        tmax = jnp.min(theta_rel)
        ok = jnp.logical_and(mask, theta <= tmax)
        amax = jnp.max(jnp.where(ok, alpha, -inf))
        q_main = jnp.min(jnp.where(jnp.logical_and(ok, alpha == amax), idx, INT_MAX))
    else:
        q_main = jnp.min(jnp.where(theta == tmin, idx, INT_MAX))

    # Bland's anti-cycling guarantee is proven for rows attaining the
    # EXACT minimum ratio; all theta here come from one expression, so exact
    # equality selects precisely the argmin tie set (a tolerance band could
    # admit a non-minimal row and break feasibility monotonicity).
    tie = theta == tmin
    big = jnp.where(tie, basis_ref[:], INT_MAX)
    bmin = jnp.min(big)
    q_bland = jnp.min(jnp.where(big == bmin, idx, INT_MAX))

    q = jnp.where(bland_ref[0, 0] != 0, q_bland, q_main)
    q = jnp.where(q == INT_MAX, 0, q)
    sel = idx == q
    theta_q = jnp.max(jnp.where(sel, theta, -inf))
    alpha_q = jnp.max(jnp.where(sel, alpha, -inf))
    theta_q = jnp.where(unbounded, inf, theta_q)

    live = jnp.logical_and(~unbounded, jnp.isfinite(theta_q))
    inv_aq = jnp.asarray(1, dtype) / jnp.where(live, alpha_q, 1)
    th = jnp.where(live, theta_q, 0)
    eta_ref[:] = jnp.where(sel, inv_aq - 1, -alpha * inv_aq)
    xbnew_ref[:] = jnp.where(sel, th, x_b - th * alpha)

    q_ref[0, 0] = q
    theta_ref[0, 0] = theta_q
    unb_ref[0, 0] = unbounded.astype(jnp.int32)


def ratio_eta(x_b, alpha, basis, pivot_tol, use_bland, harris, feas_tol=1e-6):
    """Fused (q, theta_q, unbounded, eta, x_b_new) in one kernel dispatch.

    eta / x_b_new are computed as if the pivot proceeds; on terminal steps
    the caller's do_pivot select discards them (same contract as composing
    ratio_argmin + the eta expression + the x_b axpy, but ~6 fewer kernels).
    Returns None when the shape cannot run as a single block (caller
    composes the unfused ops instead).
    """
    m = x_b.shape[0]
    if m % 128 != 0 or m > 64 * 1024:
        return None
    if not os.environ.get("SIMPLEX_TPU_FUSED"):
        # Disabled by default: measured a wash at m=512 and -3% at m=8192 on
        # the tunneled v5e (XLA's composed ops pipeline better with the
        # surrounding loop than a single pallas_call here). Set
        # SIMPLEX_TPU_FUSED=1 to enable; kept because the dispatch-latency
        # tradeoff differs on directly-attached TPUs.
        return None
    bland = use_bland.astype(jnp.int32).reshape(1, 1)
    kernel = functools.partial(
        _ratio_eta_kernel,
        pivot_tol=pivot_tol,
        feas_tol=feas_tol,
        harris=harris,
    )
    q, theta_q, unb, eta, xbnew = pl.pallas_call(
        kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
            jax.ShapeDtypeStruct((1, 1), x_b.dtype),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
            jax.ShapeDtypeStruct((1, m), x_b.dtype),
            jax.ShapeDtypeStruct((1, m), x_b.dtype),
        ],
        interpret=_interpret(),
    )(x_b.reshape(1, m), alpha.reshape(1, m), basis.reshape(1, m), bland)
    return (
        q[0, 0],
        theta_q[0, 0],
        unb[0, 0].astype(bool),
        eta.reshape(m),
        xbnew.reshape(m),
    )


# --------------------------------------------------------------------------
# Rank-1 product-form B_inv update
# --------------------------------------------------------------------------


def _rank1_kernel(eta_ref, row_ref, binv_ref, out_ref):
    out_ref[:] = binv_ref[:] + eta_ref[:] * row_ref[:]


def rank1_update(B_inv, eta, binv_q):
    """B_inv + eta (x) binv_q, tiled over rows, aliased in-place (the
    cublasSger equivalent; target >=80% of HBM roofline)."""
    m = B_inv.shape[0]
    tm = _pick_tile(m, 256, 8)
    tn = _pick_tile(m, 4096, 128)
    if tm == 0 or tn == 0:
        return _xla.rank1_update(B_inv, eta, binv_q)
    gm, gn = m // tm, m // tn
    return pl.pallas_call(
        _rank1_kernel,
        grid=(gm, gn),
        in_specs=[
            pl.BlockSpec((tm, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, tn), lambda i, j: (i, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tm, tn), lambda i, j: (i, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, m), B_inv.dtype),
        input_output_aliases={2: 0},
        cost_estimate=pl.CostEstimate(
            flops=2 * m * m,
            bytes_accessed=2 * m * m * B_inv.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=_interpret(),
    )(eta.reshape(m, 1), binv_q.reshape(1, m), B_inv)
