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

Like the single-chip solver (fo.pdhg), the solve is HOST-CHUNKED: setup
(distributed Ruiz + power iteration) runs once and returns the scaled
shards; then a bounded window-chunk executable is re-invoked with the
carried sharded state — a single unbounded device program was observed to
crash the TPU worker on long solves.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from simplex_tpu.dist.mesh import COLS_AXIS
from simplex_tpu.fo.pdhg import PDHGResult
from simplex_tpu.status import SolveStatus

_EXACT = jax.lax.Precision.HIGHEST


def _setup_local(A_loc, b, c_loc, axis_name):
    """Distributed Ruiz + spectral norm + steps (runs once, inside shard_map)."""
    dtype = jnp.float32
    m, n_loc = A_loc.shape

    def ruiz(_, carry):
        # all-zero rows/cols scale by 1 (see fo.pdhg._ruiz_equilibrate: the
        # old 1e-30 floor compounded into dr/dc and blew up b/dr)
        As, dr, dc = carry
        mr = jax.lax.pmax(jnp.max(jnp.abs(As), axis=1), axis_name)
        r = jnp.sqrt(jnp.where(mr > 0, mr, 1))
        As = As / r[:, None]
        dr = dr * r
        mc = jnp.max(jnp.abs(As), axis=0)
        c = jnp.sqrt(jnp.where(mc > 0, mc, 1))
        As = As / c[None, :]
        dc = dc * c
        return As, dr, dc

    As, dr, dc = jax.lax.fori_loop(
        0, 10, ruiz,
        (A_loc.astype(dtype), jnp.ones(m, dtype), jnp.ones(n_loc, dtype)),
    )
    bs = b.astype(dtype) / dr
    cs = (-c_loc.astype(dtype)) / dc  # minimization form

    def matvec(x_loc):
        return jax.lax.psum(
            jnp.matmul(As, x_loc, precision=_EXACT), axis_name
        )

    def power(_, v_loc):
        w = matvec(v_loc)
        v = jnp.matmul(w, As, precision=_EXACT)
        nv = jnp.sqrt(jax.lax.psum(jnp.sum(v * v), axis_name))
        return v / jnp.maximum(nv, 1e-30)

    # ramp start (globally increasing across shards) — an all-ones start
    # can be exactly orthogonal to the top singular subspace (see
    # fo.pdhg._spectral_norm); floor at the valid lower bound max|A_ij|
    col0 = jax.lax.axis_index(axis_name).astype(dtype) * n_loc
    v0 = col0 + jnp.arange(1, n_loc + 1, dtype=dtype)
    nv0 = jnp.sqrt(jax.lax.psum(jnp.sum(v0 * v0), axis_name))
    v0 = v0 / nv0
    v = jax.lax.fori_loop(0, 30, power, v0)
    nrm = jnp.maximum(
        jnp.linalg.norm(matvec(v)),
        jax.lax.pmax(jnp.max(jnp.abs(As)), axis_name),
    )

    cs_norm = jnp.sqrt(jax.lax.psum(jnp.sum(cs * cs), axis_name))
    w0 = jnp.sqrt((cs_norm + 1e-6) / (jnp.linalg.norm(bs) + 1e-6))
    eta = jnp.asarray(0.9, dtype) / jnp.maximum(nrm, 1e-30)
    # scales in ORIGINAL units (residuals map back via dr/dc; see fo.pdhg)
    b_scale = 1 + jnp.max(jnp.abs(b.astype(dtype)))
    c_scale = 1 + jax.lax.pmax(jnp.max(jnp.abs(c_loc.astype(dtype))), axis_name)
    return As, dr, dc, bs, cs, eta / w0, eta * w0, b_scale, c_scale


def _setup_local_sp(tiles, rows, cols, b, c_loc, axis_name, m, n_loc):
    """Distributed Ruiz + power iteration over a BLOCK-SPARSE column shard.

    Mirrors :func:`_setup_local` with every pass over stored tiles only;
    returns the SCALED tiles (rows/cols are re-supplied to the chunk)."""
    from simplex_tpu import sparse as bsp

    dtype = jnp.float32
    ones_m = jnp.ones(m, dtype)
    ones_n = jnp.ones(n_loc, dtype)

    def mk(t):
        return bsp.BlockSparse(t, rows, cols, (m, n_loc))

    def ruiz(_, carry):
        t, dr, dc = carry
        Mc = mk(t)
        mr = jax.lax.pmax(bsp.row_absmax(Mc), axis_name)
        r = jnp.sqrt(jnp.where(mr > 0, mr, 1))
        Mc = bsp.scale(Mc, 1 / r, ones_n)
        dr = dr * r
        mc = bsp.col_absmax(Mc)
        c = jnp.sqrt(jnp.where(mc > 0, mc, 1))
        Mc = bsp.scale(Mc, ones_m, 1 / c)
        dc = dc * c
        return Mc.tiles, dr, dc

    tiles_s, dr, dc = jax.lax.fori_loop(
        0, 10, ruiz, (tiles.astype(dtype), ones_m, ones_n)
    )
    Ms = mk(tiles_s)
    bs = b.astype(dtype) / dr
    cs = (-c_loc.astype(dtype)) / dc  # minimization form

    def matvec(x_loc):
        return jax.lax.psum(bsp.matvec(Ms, x_loc), axis_name)

    def power(_, v_loc):
        w = matvec(v_loc)
        v = bsp.rmatvec(Ms, w)
        nv = jnp.sqrt(jax.lax.psum(jnp.sum(v * v), axis_name))
        return v / jnp.maximum(nv, 1e-30)

    col0 = jax.lax.axis_index(axis_name).astype(dtype) * n_loc
    v0 = col0 + jnp.arange(1, n_loc + 1, dtype=dtype)
    nv0 = jnp.sqrt(jax.lax.psum(jnp.sum(v0 * v0), axis_name))
    v0 = v0 / nv0
    v = jax.lax.fori_loop(0, 30, power, v0)
    nrm = jnp.maximum(
        jnp.linalg.norm(matvec(v)),
        jax.lax.pmax(bsp.absmax(Ms), axis_name),
    )

    cs_norm = jnp.sqrt(jax.lax.psum(jnp.sum(cs * cs), axis_name))
    w0 = jnp.sqrt((cs_norm + 1e-6) / (jnp.linalg.norm(bs) + 1e-6))
    eta = jnp.asarray(0.9, dtype) / jnp.maximum(nrm, 1e-30)
    b_scale = 1 + jnp.max(jnp.abs(b.astype(dtype)))
    c_scale = 1 + jax.lax.pmax(jnp.max(jnp.abs(c_loc.astype(dtype))), axis_name)
    return tiles_s, dr, dc, bs, cs, eta / w0, eta * w0, b_scale, c_scale


def _chunk_local(
    As, bs, cs, dr, dc, b_scale, c_scale, us, state, max_iter,
    tol, check_every, windows, axis_name,
):
    """Advance the sharded PDHG state by at most ``windows`` check windows.

    ``us`` are the SCALED box upper bounds, column-sharded like cs (+inf
    where unbounded): the projection clips to [0, us], finite-u columns
    move from the dual residual into the dual objective (see fo.pdhg._kkt).
    """

    def matvec(x_loc):
        return jax.lax.psum(
            jnp.matmul(As, x_loc, precision=_EXACT), axis_name
        )

    def rmatvec(y):
        return jnp.matmul(y, As, precision=_EXACT)

    return _chunk_core(
        matvec, rmatvec, bs, cs, dr, dc, b_scale, c_scale, us,
        state, max_iter, tol, check_every, windows, axis_name,
    )


def _chunk_local_sp(
    tiles, rows, cols, bs, cs, dr, dc, b_scale, c_scale, us,
    state, max_iter, tol, check_every, windows, axis_name, m, n_loc,
):
    """Block-sparse variant: the shard's tiles (scaled by the setup) stand
    in for the dense A_loc; matvec/rmatvec run over stored tiles only."""
    from simplex_tpu import sparse as bsp

    Ms = bsp.BlockSparse(tiles, rows, cols, (m, n_loc))

    def matvec(x_loc):
        return jax.lax.psum(bsp.matvec(Ms, x_loc), axis_name)

    def rmatvec(y):
        return bsp.rmatvec(Ms, y)

    return _chunk_core(
        matvec, rmatvec, bs, cs, dr, dc, b_scale, c_scale, us,
        state, max_iter, tol, check_every, windows, axis_name,
    )


def _chunk_core(
    matvec, rmatvec, bs, cs, dr, dc, b_scale, c_scale, us,
    state, max_iter, tol, check_every, windows, axis_name,
):
    """Shared window loop for the dense and block-sparse layouts.

    Runs the SAME scheme as the single-chip fo.pdhg._pdhg_chunk: restart
    on PDLP's sufficient decay (0.2x) or necessary-decay-plus-rise
    (artificial) criteria, restart-to-average, and the smoothed adaptive
    primal weight applied at restart epochs (tau/sigma are loop-carried;
    the movement norms need one extra scalar psum per RESTART, not per
    iteration). State layout:
      (x, y, cnt, lre, it, sx, rp, rd, gp, stall, sy, tau, sigma, xr, yr)
    with x/sx/xr column-sharded and everything else replicated.
    """
    dtype = bs.dtype
    BETA_SUF = jnp.asarray(0.2, dtype)
    BETA_NEC = jnp.asarray(0.8, dtype)
    finite_u = jnp.isfinite(us)

    def kkt(x_loc, y):
        rp = jnp.max(jnp.abs(dr * (matvec(x_loc) - bs))) / b_scale
        red = cs - rmatvec(y)
        rd = (
            jax.lax.pmax(
                jnp.max(jnp.where(finite_u, 0, dc * jnp.maximum(-red, 0))),
                axis_name,
            )
            / c_scale
        )
        pobj = jax.lax.psum(jnp.dot(cs, x_loc, precision=_EXACT), axis_name)
        dobj = jnp.dot(bs, y, precision=_EXACT) + jax.lax.psum(
            jnp.sum(jnp.where(finite_u, us, 0) * jnp.minimum(red, 0)),
            axis_name,
        )
        gap = jnp.abs(pobj - dobj) / (1 + jnp.abs(pobj) + jnp.abs(dobj))
        return rp, rd, gap

    def make_inner(tau, sigma):
        def inner(carry, _):
            x, y, sx, sy = carry
            x1 = jnp.minimum(jnp.maximum(x - tau * (cs - rmatvec(y)), 0), us)
            y1 = y + sigma * (bs - matvec(2 * x1 - x))
            return (x1, y1, sx + x1, sy + y1), None

        return inner

    def cond(carry):
        s, wc = carry
        it, rp, rd, gp, stall = s[4], s[6], s[7], s[8], s[9]
        done = jnp.logical_and(jnp.logical_and(rp < tol, rd < tol), gp < tol)
        return jnp.logical_and(
            jnp.logical_and(
                jnp.logical_and(~done, stall < 64), it < max_iter
            ),
            wc < windows,
        )

    def body(carry):
        s, wc = carry
        (
            x, y, cnt, lre, it, sx, rp0, rd0, gp0, stall, sy, tau, sigma,
            xr, yr,
        ) = s
        (x1, y1, sx1, sy1), _ = jax.lax.scan(
            make_inner(tau, sigma), (x, y, sx, sy), None, length=check_every
        )
        cnt1 = cnt + check_every
        xa, ya = sx1 / cnt1, sy1 / cnt1
        rp_c, rd_c, gp_c = kkt(x1, y1)
        rp_a, rd_a, gp_a = kkt(xa, ya)
        err_c = jnp.maximum(jnp.maximum(rp_c, rd_c), gp_c)
        err_a = jnp.maximum(jnp.maximum(rp_a, rd_a), gp_a)
        err = jnp.minimum(err_c, err_a)
        err_prev = jnp.maximum(jnp.maximum(rp0, rd0), gp0)
        restart = jnp.logical_or(
            jnp.logical_or(
                err <= BETA_SUF * lre,
                jnp.logical_and(err <= BETA_NEC * lre, err > err_prev),
            ),
            err < tol,
        )
        avg_better = err_a < err_c
        adopt = jnp.logical_and(restart, avg_better)
        x2 = jnp.where(adopt, xa, x1)
        y2 = jnp.where(adopt, ya, y1)
        sx2 = jnp.where(restart, jnp.zeros_like(sx1), sx1)
        sy2 = jnp.where(restart, jnp.zeros_like(sy1), sy1)
        cnt2 = jnp.where(restart, 0, cnt1)
        lre2 = jnp.where(restart, err, lre)
        # smoothed adaptive primal weight at restart epochs (see fo.pdhg):
        # dxn needs a psum (x sharded); dyn is local (y replicated)
        dxn = jnp.sqrt(
            jax.lax.psum(jnp.sum((x2 - xr) * (x2 - xr)), axis_name)
        )
        dyn = jnp.linalg.norm(y2 - yr)
        w_old = jnp.sqrt(sigma / tau)
        eta = jnp.sqrt(sigma * tau)
        valid = jnp.logical_and(dxn > 1e-12, dyn > 1e-12)
        w_new = jnp.where(valid, jnp.sqrt((dyn / dxn) * w_old), w_old)
        w_new = jnp.clip(w_new, 1e-4, 1e4)
        tau2 = jnp.where(restart, eta / w_new, tau)
        sigma2 = jnp.where(restart, eta * w_new, sigma)
        xr2 = jnp.where(restart, x2, xr)
        yr2 = jnp.where(restart, y2, yr)
        rp = jnp.where(adopt, rp_a, rp_c)
        rd = jnp.where(adopt, rd_a, rd_c)
        gp = jnp.where(adopt, gp_a, gp_c)
        stall = jnp.where(err < err_prev * (1 - 1e-4), 0, stall + 1)
        s2 = (
            x2, y2, cnt2, lre2, it + check_every, sx2, rp, rd, gp, stall,
            sy2, tau2, sigma2, xr2, yr2,
        )
        return s2, wc + 1

    state, _ = jax.lax.while_loop(cond, body, (state, jnp.int32(0)))
    return state


@functools.lru_cache(maxsize=16)
def _build_fns(mesh, axis_name, tol, check_every, windows):
    """Cached jitted setup + chunk executables for this mesh/params."""
    xs = P(axis_name)  # column-sharded vectors
    rep = P()

    setup = jax.jit(
        jax.shard_map(
            functools.partial(_setup_local, axis_name=axis_name),
            mesh=mesh,
            in_specs=(P(None, axis_name), P(None), xs),
            out_specs=(
                P(None, axis_name), rep, xs, rep, xs, rep, rep, rep, rep
            ),
            check_vma=False,
        )
    )
    state_specs = (
        xs, rep, rep, rep, rep, xs, rep, rep, rep, rep, rep, rep, rep,
        xs, rep,
    )
    chunk = jax.jit(
        jax.shard_map(
            functools.partial(
                _chunk_local,
                tol=tol,
                check_every=check_every,
                windows=windows,
                axis_name=axis_name,
            ),
            mesh=mesh,
            in_specs=(
                P(None, axis_name), rep, xs, rep, xs, rep, rep,
                xs, state_specs, rep,
            ),
            out_specs=state_specs,
            check_vma=False,
        )
    )
    return setup, chunk


@functools.lru_cache(maxsize=16)
def _build_fns_sp(mesh, axis_name, tol, check_every, windows, m, n_loc):
    """Cached jitted setup + chunk for the BLOCK-SPARSE layout: each
    shard's (T, br, bc) tile slab shards along its leading axis."""
    xs = P(axis_name)
    rep = P()
    ts = P(axis_name, None, None)  # (D*T, br, bc) -> (T, br, bc) per shard

    setup = jax.jit(
        jax.shard_map(
            functools.partial(
                _setup_local_sp, axis_name=axis_name, m=m, n_loc=n_loc
            ),
            mesh=mesh,
            in_specs=(ts, xs, xs, P(None), xs),
            out_specs=(ts, rep, xs, rep, xs, rep, rep, rep, rep),
            check_vma=False,
        )
    )
    state_specs = (
        xs, rep, rep, rep, rep, xs, rep, rep, rep, rep, rep, rep, rep,
        xs, rep,
    )
    chunk = jax.jit(
        jax.shard_map(
            functools.partial(
                _chunk_local_sp,
                tol=tol,
                check_every=check_every,
                windows=windows,
                axis_name=axis_name,
                m=m,
                n_loc=n_loc,
            ),
            mesh=mesh,
            in_specs=(
                ts, xs, xs, rep, xs, rep, xs, rep, rep,
                xs, state_specs, rep,
            ),
            out_specs=state_specs,
            check_vma=False,
        )
    )
    return setup, chunk


def solve_pdhg_sharded(
    A,
    b,
    c,
    mesh: jax.sharding.Mesh,
    *,
    u=None,
    tol: float = 1e-4,
    max_iter: int = 1_000_000,
    check_every: int = 128,
    axis_name: str = COLS_AXIS,
) -> PDHGResult:
    """Distributed PDHG with A's columns sharded over ``mesh[axis_name]``.

    ``u`` (optional (n,), +inf = unbounded) adds native box bounds exactly
    as in :func:`simplex_tpu.fo.pdhg.solve_pdhg` — the bound vector shards
    with the columns, so bounds cost no extra collectives.

    ``A`` may be a :class:`simplex_tpu.sparse.BlockSparse`: its tiles are
    partitioned by column range across the mesh (``sparse.shard_columns``)
    and every pass runs over stored tiles only — per-chip memory becomes
    the shard's TILES, the layout for huge sparse instances."""
    from simplex_tpu import sparse as bsp

    is_sparse = isinstance(A, bsp.BlockSparse)
    if not is_sparse:
        A = jnp.asarray(A)
    b = jnp.asarray(b)
    c = jnp.asarray(c)
    m, n = A.shape
    D = mesh.shape[axis_name]
    if n % D != 0:
        raise ValueError(f"n={n} not divisible by mesh axis size {D}")
    u_np = np.full(n, np.inf) if u is None else np.asarray(u, np.float64)
    if u is not None and np.any(u_np < 0):
        raise ValueError("negative upper bound (shift lowers to 0 first)")

    if is_sparse:
        t_st, r_st, c_st, n_loc = bsp.shard_columns(A, D)
        Dn, T, br, bc = t_st.shape
        tiles_flat = t_st.reshape(Dn * T, br, bc)
        rows_flat = r_st.reshape(-1)
        cols_flat = c_st.reshape(-1)
        # per-chip bytes per iteration = the shard's stored tiles
        iters_per_call = int(
            min(max(1e13 / (8 * T * br * bc), check_every), 65536)
        )
        windows = max(1, iters_per_call // check_every)
        setup, chunk = _build_fns_sp(
            mesh, axis_name, float(tol), int(check_every), int(windows),
            int(m), int(n_loc),
        )
        tiles_s, dr, dc, bs, cs, tau, sigma, b_scale, c_scale = setup(
            tiles_flat, rows_flat, cols_flat, b, c
        )
        A_args = (tiles_s, rows_flat, cols_flat)
    else:
        # chunk budget sized like fo.pdhg: ~1e13 streamed bytes per call
        iters_per_call = int(
            min(max(1e13 / (8 * m * n / D), check_every), 65536)
        )
        windows = max(1, iters_per_call // check_every)
        setup, chunk = _build_fns(
            mesh, axis_name, float(tol), int(check_every), int(windows)
        )
        As, dr, dc, bs, cs, tau, sigma, b_scale, c_scale = setup(A, b, c)
        A_args = (As,)
    # scaled bounds: x = xs / dc => xs <= u * dc (inherits dc's sharding)
    us = jnp.asarray(u_np, jnp.float32) * dc

    dt = jnp.float32
    inf = jnp.asarray(jnp.inf, dt)
    # state layout: (x, y, cnt, lre, it, sx, rp, rd, gp, stall, sy,
    #                tau, sigma, xr, yr) — see _chunk_core
    state = (
        jnp.zeros(n, dt), jnp.zeros(m, dt), jnp.int32(0), inf, jnp.int32(0),
        jnp.zeros(n, dt), inf, inf, inf, jnp.int32(0), jnp.zeros(m, dt),
        tau, sigma, jnp.zeros(n, dt), jnp.zeros(m, dt),
    )
    while True:
        state = chunk(
            *A_args, bs, cs, dr, dc, b_scale, c_scale, us, state,
            jnp.int32(max_iter),
        )
        it = int(state[4])
        rp, rd, gp = float(state[6]), float(state[7]), float(state[8])
        stall = int(state[9])
        if max(rp, rd, gp) < tol or it >= max_iter or stall >= 64:
            break

    x = np.asarray(jax.device_get(state[0] / dc), np.float64)
    y = np.asarray(jax.device_get(state[1] / dr), np.float64)
    rp_f, rd_f, gp_f = rp, rd, gp
    ok = max(rp_f, rd_f, gp_f) < tol
    ray_p = ray_d = None
    if ok:
        status = SolveStatus.OPTIMAL
    else:
        # same exit-time infeasibility detection as the single-chip path:
        # the certificates are small host vectors; the metric GEMVs run on
        # the full A (dense array or BlockSparse)
        from simplex_tpu.fo.pdhg import _certify

        cmin = np.asarray(-np.asarray(c), np.float64)
        xr = np.asarray(jax.device_get(state[13] / dc), np.float64)
        yr = np.asarray(jax.device_get(state[14] / dr), np.float64)
        cert, ray_p, ray_d = _certify(
            A, jnp.asarray(b), jnp.asarray(cmin, jnp.float32), x, y, xr, yr,
            1 + float(np.abs(np.asarray(b)).max()),
            1 + float(np.abs(cmin).max()),
            1e-5, u_np,
        )
        if cert is not None:
            status = cert
        elif stall >= 64:
            status = SolveStatus.SINGULAR
        else:
            status = SolveStatus.MAX_ITER
    z = float(np.asarray(c, np.float64) @ x)
    return PDHGResult(
        z=z,
        x=x,
        y=-y,
        status=status,
        iters=it,
        primal_res=rp_f,
        dual_res=rd_f,
        gap=gp_f,
        ray_primal=ray_p,
        ray_dual=ray_d,
    )
