"""Per-op kernel benchmarks (the TimeStruct y/p/B_inv/x_b phase breakdown of
the reference, src/v1_baseline.cu:521-536, done right: device-side scan with
a serialization-forcing carry, timed with block_until_ready).

Each op is timed as one jitted lax.scan of K applications whose inputs depend
on the previous output (prevents batching/hoisting/memoization — the tunneled
dev runtime memoizes identical dispatches), so wall time / K approximates
per-op latency. Caveat: on the tunneled dev runtime each serialized scan
iteration carries a substantial fixed overhead that the real solver's
while_loop amortizes by overlapping independent ops, so these numbers are
upper bounds useful for RELATIVE comparison; the full-solve benches
(bench.py) are the ground truth.
"""

from __future__ import annotations

import time
from typing import Callable, Dict

import jax
import jax.numpy as jnp
import numpy as np


def _timed(fn: Callable, *args, iters: int = 3) -> float:
    import jax.numpy as jnp

    def force(out):
        # scalar pull: block_until_ready alone can return early on the
        # tunneled dev runtime
        leaf = jax.tree_util.tree_leaves(out)[0]
        float(jnp.asarray(leaf).ravel()[0])

    force(fn(*args))
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        force(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def bench_ops(m: int, n: int, k: int = 32, backend: str = "xla") -> Dict[str, dict]:
    """Benchmark the four phases at (m, n). Returns {op: {ms, gbps}}."""
    from simplex_tpu.kernels.dispatch import get_backend

    be = get_backend(backend)
    rng = np.random.default_rng(0)
    A = jax.device_put(jnp.asarray(rng.standard_normal((m, n)), jnp.float32))
    B = jax.device_put(jnp.asarray(rng.standard_normal((m, m)) * 0.01, jnp.float32))
    c = jax.device_put(jnp.asarray(rng.standard_normal(n), jnp.float32))
    y0 = jax.device_put(jnp.asarray(rng.standard_normal(m), jnp.float32))
    basis = jnp.arange(m, dtype=jnp.int32)
    no = jnp.asarray(False)

    results: Dict[str, dict] = {}

    def record(name, seconds, bytes_per_iter):
        per = seconds / k
        results[name] = {
            "ms": round(per * 1e3, 4),
            "gbps": round(bytes_per_iter / per / 1e9, 1),
        }

    # NB: the big arrays are jit ARGUMENTS, not closure constants — closed-over
    # device arrays get baked into the HLO and blow up the compile payload.

    # --- pricing + argmin (reads A once) ---
    @jax.jit
    def pricing_loop(y, Aa, ca):
        def step(yc, _):
            p, min_e = be.choose_entering(yc, Aa, ca, 1e-6, no)
            # fold the result back into y: forces serialization
            yc = yc + min_e * 1e-20 + p.astype(jnp.float32) * 0
            return yc, None

        yc, _ = jax.lax.scan(step, y, None, length=k)
        return yc

    record("pricing_argmin", _timed(pricing_loop, y0, A, c), 4 * m * n)

    # --- ftran: alpha = B_inv @ A_p (reads B_inv once) ---
    @jax.jit
    def ftran_loop(col, Bb):
        def step(cc, _):
            alpha = Bb @ cc
            return alpha / (jnp.max(jnp.abs(alpha)) + 1), None

        cc, _ = jax.lax.scan(step, col, None, length=k)
        return cc

    record("ftran", _timed(ftran_loop, y0, B), 4 * m * m)

    # --- ratio test (O(m)) ---
    @jax.jit
    def ratio_loop(xb, al):
        def step(xc, _):
            q, theta, unb = be.ratio_argmin(xc, al, basis, 1e-7, no)
            return xc + theta * 1e-20 + q.astype(jnp.float32) * 0, None

        xc, _ = jax.lax.scan(step, xb, None, length=k)
        return xc

    record("ratio_argmin", _timed(ratio_loop, jnp.abs(y0), y0), 12 * m)

    # --- rank-1 B_inv update (reads + writes B_inv) ---
    @jax.jit
    def rank1_loop(Bv):
        def step(Bc, _):
            eta = Bc[0] * 1e-6
            row = Bc[1]
            return be.rank1_update(Bc, eta, row), None

        Bc, _ = jax.lax.scan(step, Bv, None, length=k)
        return Bc

    record("rank1_update", _timed(rank1_loop, B), 8 * m * m)

    # --- flagship-path extras: segment pricing (1/S read), rank-L flush ---
    S, L = 8, 16
    if n % S == 0:
        Ab = A.astype(jnp.bfloat16)

        @jax.jit
        def seg_loop(y, Aa, ca):
            w = n // S

            def step(yc, i):
                start = (i % S) * w
                A_seg = jax.lax.dynamic_slice(Aa, (jnp.int32(0), start), (m, w))
                c_seg = jax.lax.dynamic_slice(ca, (start,), (w,))
                p, mn = be.choose_entering(yc, A_seg, c_seg, 1e-6, no)
                return yc + mn * 1e-20 + p.astype(jnp.float32) * 0, None

            yc, _ = jax.lax.scan(
                step, y, jnp.arange(k, dtype=jnp.int32), length=k
            )
            return yc

        record(
            "pricing_segment_bf16", _timed(seg_loop, y0, Ab, c), 2 * m * (n // S)
        )

    U = jnp.asarray(rng.standard_normal((L, m)) * 1e-3, jnp.float32)
    R = jnp.asarray(rng.standard_normal((L, m)) * 1e-3, jnp.float32)

    @jax.jit
    def flush_loop(Bv, Uv, Rv):
        def step(Bc, _):
            Bn = Bc + jnp.matmul(
                Uv.T, Rv, precision=jax.lax.Precision.HIGHEST
            ) * 1e-20
            return Bn, None

        Bc, _ = jax.lax.scan(step, Bv, None, length=k)
        return Bc

    # amortized: one flush per L pivots
    t_flush = _timed(flush_loop, B, U, R) / L
    results["flush_rankL_amortized"] = {
        "ms": round(t_flush * 1e3, 4),
        "gbps": round(8 * m * m / L / t_flush / 1e9, 1),
    }

    # --- block-sparse matvec / rmatvec (the first-order mode's hot ops
    # on a structured instance: ~10% tile density here) ---
    from simplex_tpu import sparse as bsp

    mask = rng.uniform(size=(max(1, m // 128), max(1, n // 128))) < 0.10
    if not mask.any():
        mask[0, 0] = True
    A_sp_host = np.asarray(A).copy()
    keep = np.kron(mask, np.ones((128, 128), bool))[:m, :n]
    A_sp_host[~keep] = 0.0
    M = bsp.from_dense(A_sp_host, block_shape=(128, 128))
    x0 = jax.device_put(jnp.asarray(rng.standard_normal(n), jnp.float32))
    stored = M.n_tiles * 128 * 128 * 4

    @jax.jit
    def sp_mv_loop(tiles, rows, cols, x):
        Ms = bsp.BlockSparse(tiles, rows, cols, (m, n))

        def step(xc, _):
            yv = bsp.matvec(Ms, xc)
            return xc + jnp.pad(yv, (0, n - m)) * 1e-20, None

        xc, _ = jax.lax.scan(step, x, None, length=k)
        return xc

    record(
        f"bsp_matvec_density{M.tile_density():.2f}",
        _timed(sp_mv_loop, M.tiles, M.rows, M.cols, x0),
        stored,
    )

    @jax.jit
    def sp_rmv_loop(tiles, rows, cols, y):
        Ms = bsp.BlockSparse(tiles, rows, cols, (m, n))

        def step(yc, _):
            xv = bsp.rmatvec(Ms, yc)
            return yc + xv[:m] * 1e-20, None

        yc, _ = jax.lax.scan(step, y, None, length=k)
        return yc

    record(
        f"bsp_rmatvec_density{M.tile_density():.2f}",
        _timed(sp_rmv_loop, M.tiles, M.rows, M.cols, y0),
        stored,
    )

    return results


def main() -> None:
    import argparse
    import json
    import sys

    ap = argparse.ArgumentParser()
    ap.add_argument("--m", type=int, default=8192)
    ap.add_argument("--n", type=int, default=16384)
    ap.add_argument("--k", type=int, default=32)
    ap.add_argument("--backend", default="xla", choices=["xla", "pallas"])
    args = ap.parse_args()
    res = bench_ops(args.m, args.n, args.k, args.backend)
    total_ms = sum(v["ms"] for v in res.values())
    print(
        json.dumps(
            {"m": args.m, "n": args.n, "backend": args.backend, "ops": res,
             "total_pivot_ms": round(total_ms, 3)},
        )
    )
    print(f"-> {1000.0/total_ms:.0f} pivots/s roofline from phases", file=sys.stderr)


if __name__ == "__main__":
    main()
