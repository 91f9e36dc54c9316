"""Headline benchmark: pivots/sec on a dense 8k x 8k LP (BASELINE.json metric).

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "pivots/sec", "vs_baseline": N}

The reference publishes no numbers (BASELINE.md), so vs_baseline compares
against a documented roofline ESTIMATE of the reference's v4 solver on its
own documented hardware (GTX 1050 Ti, README.md:11 of the reference):

  per-pivot HBM traffic (fp32, m=8192, n=16384):
    pricing GEMM reads D (m+1) x n      = 512 MB
    ftran GEMV reads B_inv m x m        = 256 MB
    rank-1 GER reads+writes B_inv       = 512 MB
    ----------------------------------- ~1.28 GB / pivot
  GTX 1050 Ti HBM bandwidth 112 GB/s  ->  ~11.4 ms/pivot  ->  ~87 pivots/s

This is an upper bound for the reference (ignores its 3-4 host syncs per
pivot), i.e. a conservative baseline for us to beat.

Defaults run the flagship TPU config: bf16 pricing shadow (exact-termination
fallback) + deferred rank-16 B_inv updates — both verified bit-exact against
the oracle in tests/.

Usage: python bench.py [--m M] [--n N] [--pivots K] [--small]
Details go to stderr; the JSON line is the only stdout output.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

REFERENCE_ROOFLINE_PIVOTS_PER_SEC = 87.0  # see module docstring


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--m", type=int, default=8192)
    ap.add_argument("--n", type=int, default=16384)
    ap.add_argument("--pivots", type=int, default=128)
    ap.add_argument("--backend", default="xla", choices=["xla", "pallas"])
    ap.add_argument("--pricing", default="dantzig", choices=["dantzig", "devex"])
    ap.add_argument(
        "--pricing-dtype", default="bfloat16", choices=["float32", "bfloat16"]
    )
    ap.add_argument("--update-defer", type=int, default=16)
    ap.add_argument("--small", action="store_true", help="quick 512x1024 run")
    args = ap.parse_args()
    if args.small:
        args.m, args.n = 512, 1024

    import jax

    from simplex_tpu.config import SimplexOptions
    from simplex_tpu.core.solver import _solve_jit
    from simplex_tpu.oracle.generator import random_dense_lp

    m, n, k = args.m, args.n, args.pivots
    log(f"devices: {jax.devices()}")
    log(f"generating dense LP {m}x{n} (A = {m*n*4/2**20:.0f} MiB fp32)...")
    A, b, c = random_dense_lp(m, n, seed=0, dtype=np.float32)

    opts = SimplexOptions(
        max_iter=k,
        backend=args.backend,
        pricing=args.pricing,
        pricing_dtype=args.pricing_dtype,
        update_defer=args.update_defer,
    )
    basis0 = np.arange(n - m, n, dtype=np.int32)

    log("transferring to device...")
    t0 = time.time()
    A, b, c, basis0 = jax.device_put((A, b, c, basis0))
    jax.block_until_ready((A, b, c))
    log(f"H2D: {time.time()-t0:.1f}s")

    def run():
        final = _solve_jit(A, b, c, basis0, opts, k, True)
        final.x_b.block_until_ready()
        return final

    log("compile + warmup run...")
    t0 = time.time()
    final = run()
    log(f"warmup: {time.time()-t0:.1f}s, iters={int(final.iters)} "
        f"status={int(final.status)}")

    log("timed run...")
    t0 = time.time()
    final = run()
    dt = time.time() - t0
    iters = int(final.iters)
    pps = iters / dt if dt > 0 else float("nan")
    traffic_gb = iters * (4.0 * (m * n + 3 * m * m)) / 1e9
    log(
        f"{iters} pivots in {dt:.3f}s -> {pps:.1f} pivots/s; "
        f"~{traffic_gb/dt:.0f} GB/s effective HBM traffic"
    )

    print(
        json.dumps(
            {
                "metric": f"pivots_per_sec_dense_{m}x{n}_fp32",
                "value": round(pps, 2),
                "unit": "pivots/sec",
                "vs_baseline": round(pps / REFERENCE_ROOFLINE_PIVOTS_PER_SEC, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
