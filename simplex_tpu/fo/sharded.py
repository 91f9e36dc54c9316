"""Column-sharded distributed PDHG: ONE psum per iteration.

The first-order mode's scaling story (complements the simplex modes in
:mod:`simplex_tpu.dist`): shard the columns of A (and x, c) over the mesh,
replicate y and b. Then per iteration

    x+ = max(0, x - tau (c - A^T y))    A^T y is SHARD-LOCAL (y replicated)
    y+ = y + sigma (b - A (2x+ - x))    A x is a local GEMV + one m-float
                                        psum over ICI

— a single collective per iteration, O(m) bytes, against O(mn/D) local
GEMV work per chip. Compare the simplex modes' 2-4 collectives per pivot
plus an O(m^2) inverse; PDHG has no inverse at all, so the per-chip memory
is exactly A's shard. This is the decomposition for instances whose A
doesn't fit one chip AND whose tolerance budget allows a first-order
answer.

Ruiz equilibration, the spectral norm, and the restart bookkeeping all run
on replicated/local quantities (column norms are local; row norms need one
psum-max per Ruiz sweep — done once at setup).

NOTE: this variant still runs the whole solve as ONE device program. The
single-chip solver (fo.pdhg) moved to host-chunked dispatch after a
multi-minute single call crashed the TPU worker at 8192x16384; if that
shows up on a real pod slice, split this the same way (setup shard_map
producing the scaled shards once, then a windowed chunk shard_map with the
carried sharded state).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from simplex_tpu.dist.mesh import COLS_AXIS
from simplex_tpu.fo.pdhg import PDHGResult
from simplex_tpu.status import SolveStatus

_EXACT = jax.lax.Precision.HIGHEST


def _pdhg_local(A_loc, b, c_loc, tol, max_iter, check_every, axis_name):
    """Shard-local PDHG body (inside shard_map). Mirrors fo.pdhg._pdhg_jit
    with psums where a full-width contraction is needed."""
    dtype = jnp.float32
    m, n_loc = A_loc.shape

    # --- distributed Ruiz: row inf-norms need a pmax across shards ---
    def ruiz(_, carry):
        As, dr, dc = carry
        r_loc = jnp.max(jnp.abs(As), axis=1)
        r = jnp.sqrt(jnp.maximum(jax.lax.pmax(r_loc, axis_name), 1e-30))
        As = As / r[:, None]
        dr = dr * r
        c = jnp.sqrt(jnp.maximum(jnp.max(jnp.abs(As), axis=0), 1e-30))
        As = As / c[None, :]
        dc = dc * c
        return As, dr, dc

    As, dr, dc = jax.lax.fori_loop(
        0, 10, ruiz,
        (A_loc.astype(dtype), jnp.ones(m, dtype), jnp.ones(n_loc, dtype)),
    )
    bs = b.astype(dtype) / dr
    cs = (-c_loc.astype(dtype)) / dc  # minimization form

    def matvec(x_loc):  # A x: local GEMV + one m-float psum
        return jax.lax.psum(
            jnp.matmul(As, x_loc, precision=_EXACT), axis_name
        )

    def rmatvec(y):  # A^T y: shard-local
        return jnp.matmul(y, As, precision=_EXACT)

    # --- distributed power iteration for ||A||_2 ---
    def power(_, v_loc):
        w = matvec(v_loc)
        v = rmatvec(w)
        nv = jnp.sqrt(jax.lax.psum(jnp.sum(v * v), axis_name))
        return v / jnp.maximum(nv, 1e-30)

    v0 = jnp.ones(n_loc, dtype) / jnp.sqrt(
        jnp.asarray(n_loc * jax.lax.axis_size(axis_name), dtype)
    )
    v = jax.lax.fori_loop(0, 30, power, v0)
    nrm = jnp.linalg.norm(matvec(v))

    cs_norm = jnp.sqrt(jax.lax.psum(jnp.sum(cs * cs), axis_name))
    w0 = jnp.sqrt((cs_norm + 1e-6) / (jnp.linalg.norm(bs) + 1e-6))
    eta = jnp.asarray(0.9, dtype) / jnp.maximum(nrm, 1e-30)
    tau = eta / w0
    sigma = eta * w0
    # scales and residuals in ORIGINAL units (see fo.pdhg._kkt): the
    # scaled residuals map back elementwise via dr / dc
    b_scale = 1 + jnp.max(jnp.abs(b.astype(dtype)))
    c_scale = 1 + jax.lax.pmax(jnp.max(jnp.abs(c_loc.astype(dtype))), axis_name)
    BETA = jnp.asarray(0.2, dtype)

    def kkt(x_loc, y):
        rp = jnp.max(jnp.abs(dr * (matvec(x_loc) - bs))) / b_scale
        red = cs - rmatvec(y)
        rd = (
            jax.lax.pmax(
                jnp.max(dc * jnp.maximum(-red, 0)), axis_name
            )
            / c_scale
        )
        pobj = jax.lax.psum(jnp.dot(cs, x_loc, precision=_EXACT), axis_name)
        dobj = jnp.dot(bs, y, precision=_EXACT)
        gap = jnp.abs(pobj - dobj) / (1 + jnp.abs(pobj) + jnp.abs(dobj))
        return rp, rd, gap

    def inner(carry, _):
        x, y, sx, sy = carry
        x1 = jnp.maximum(x - tau * (cs - rmatvec(y)), 0)
        y1 = y + sigma * (bs - matvec(2 * x1 - x))
        return (x1, y1, sx + x1, sy + y1), None

    def cond(s):
        it, rp, rd, gp, stall = s[6], s[7], s[8], s[9], s[10]
        done = jnp.logical_and(jnp.logical_and(rp < tol, rd < tol), gp < tol)
        return jnp.logical_and(
            jnp.logical_and(~done, it < max_iter), stall < 64
        )

    def body(s):
        x, y, sx, sy, cnt, lre, it, rp0, rd0, gp0, stall = s
        (x1, y1, sx1, sy1), _ = jax.lax.scan(
            inner, (x, y, sx, sy), None, length=check_every
        )
        cnt1 = cnt + check_every
        xa, ya = sx1 / cnt1, sy1 / cnt1
        rp_c, rd_c, gp_c = kkt(x1, y1)
        rp_a, rd_a, gp_a = kkt(xa, ya)
        err_c = jnp.maximum(jnp.maximum(rp_c, rd_c), gp_c)
        err_a = jnp.maximum(jnp.maximum(rp_a, rd_a), gp_a)
        err = jnp.minimum(err_c, err_a)
        restart = jnp.logical_or(err <= BETA * lre, err < tol)
        avg_better = err_a < err_c
        adopt = jnp.logical_and(restart, avg_better)
        x2 = jnp.where(adopt, xa, x1)
        y2 = jnp.where(adopt, ya, y1)
        sx2 = jnp.where(restart, jnp.zeros_like(sx1), sx1)
        sy2 = jnp.where(restart, jnp.zeros_like(sy1), sy1)
        cnt2 = jnp.where(restart, 0, cnt1)
        lre2 = jnp.where(restart, err, lre)
        # residuals of the point actually carried (see fo.pdhg)
        rp = jnp.where(adopt, rp_a, rp_c)
        rd = jnp.where(adopt, rd_a, rd_c)
        gp = jnp.where(adopt, gp_a, gp_c)
        err_prev = jnp.maximum(jnp.maximum(rp0, rd0), gp0)
        stall = jnp.where(err < err_prev * (1 - 1e-4), 0, stall + 1)
        return (
            x2, y2, sx2, sy2, cnt2, lre2, it + check_every, rp, rd, gp, stall
        )

    inf = jnp.asarray(jnp.inf, dtype)
    zx = jnp.zeros(n_loc, dtype)
    zy = jnp.zeros(m, dtype)
    s0 = (
        zx, zy, zx, zy, jnp.int32(0), inf, jnp.int32(0), inf, inf, inf,
        jnp.int32(0),
    )
    x, y, _, _, _, _, it, rp, rd, gp, stall = jax.lax.while_loop(
        cond, body, s0
    )
    return x / dc, y / dr, it, rp, rd, gp, stall


def solve_pdhg_sharded(
    A,
    b,
    c,
    mesh: jax.sharding.Mesh,
    *,
    tol: float = 1e-4,
    max_iter: int = 1_000_000,
    check_every: int = 128,
    axis_name: str = COLS_AXIS,
) -> PDHGResult:
    """Distributed PDHG with A's columns sharded over ``mesh[axis_name]``."""
    A = jnp.asarray(A)
    b = jnp.asarray(b)
    c = jnp.asarray(c)
    m, n = A.shape
    D = mesh.shape[axis_name]
    if n % D != 0:
        raise ValueError(f"n={n} not divisible by mesh axis size {D}")

    def shard_fn(A_loc, b_rep, c_loc):
        return _pdhg_local(
            A_loc, b_rep, c_loc, tol, max_iter, check_every, axis_name
        )

    fn = jax.jit(
        jax.shard_map(
            shard_fn,
            mesh=mesh,
            in_specs=(P(None, axis_name), P(None), P(axis_name)),
            out_specs=(
                P(axis_name), P(None), P(), P(), P(), P(), P(),
            ),
            check_vma=False,
        )
    )
    x, y, it, rp, rd, gp, stall = fn(A, b, c)
    x = np.asarray(jax.device_get(x), np.float64)
    y = np.asarray(jax.device_get(y), np.float64)
    rp_f, rd_f, gp_f = float(rp), float(rd), float(gp)
    ok = max(rp_f, rd_f, gp_f) < tol
    if ok:
        status = SolveStatus.OPTIMAL
    elif int(stall) >= 64:
        status = SolveStatus.SINGULAR
    else:
        status = SolveStatus.MAX_ITER
    z = float(np.asarray(c, np.float64) @ x)
    return PDHGResult(
        z=z,
        x=x,
        y=-y,
        status=status,
        iters=int(it),
        primal_res=rp_f,
        dual_res=rd_f,
        gap=gp_f,
    )
