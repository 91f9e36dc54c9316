"""Command-line driver: solve / verify / bench.

The reference's CLI is one positional arg per solver binary
(``./bin/solverN.out input.txt``, ``src/v4_cub_reduction.cu:384-474``) which
prints the solution keyed by basis index plus a phase-timing report. This CLI
reproduces that surface (``solve``) and adds the workflows the reference did
by hand: ``verify`` (automated oracle parity — the manual GLPK comparison of
SURVEY.md §4) and ``bench`` (pivots/s).

Usage:
  python -m simplex_tpu.cli solve INPUT [--mps] [--fp64] [--backend B] [--time]
  python -m simplex_tpu.cli verify INPUT [--mps]
  python -m simplex_tpu.cli bench [--m M] [--n N] [--pivots K]
"""

from __future__ import annotations

import argparse
import sys

import numpy as np


def _load(path: str, use_mps: bool, sparse: bool = False):
    """Returns ``(loaded, c0, maximize)`` where ``loaded`` is either
    ``(A, b, c, basis0)`` in canonical form or a :class:`GeneralLP` (routed
    to the two-phase solver when the MPS instance has >= / = rows or
    non-default bounds). The solver always maximizes; ``c0``/``maximize``
    let the caller report the objective in the instance's own sense.

    ``sparse=True`` (MPS only) keeps A a scipy.sparse matrix end-to-end:
    the reader builds csc from the COLUMNS triplets, the two-phase
    standardization stays sparse, and the core solver tiles to a
    BlockSparse — dense A never materializes (always the general route;
    the canonical-form shortcut slices dense arrays)."""
    if use_mps or path.endswith(".mps"):
        from simplex_tpu.core.twophase import GeneralLP
        from simplex_tpu.io.mps import mps_to_canonical, read_mps

        prob = read_mps(path, sparse=sparse)
        default_bounds = not (
            np.any(prob.lower != 0) or np.any(np.isfinite(prob.upper))
        )
        if (
            not sparse
            and default_bounds
            and all(t == "L" for t in prob.row_types)
            and np.all(prob.b >= 0)
        ):
            lp = mps_to_canonical(prob)
            return (lp.A, lp.b, lp.c, lp.basis0), prob.c0, prob.maximize
        # mixed rows and/or non-default bounds: two-phase route. Bounds are
        # passed through (round-1 verdict: dropping them here produced a
        # wrong OPTIMAL on an infeasible bounded instance).
        c = prob.c if prob.maximize else -prob.c
        lp = GeneralLP(
            A=prob.A, b=prob.b, c=c, row_types=prob.row_types,
            lower=prob.lower, upper=prob.upper,
        )
        return lp, prob.c0, prob.maximize
    from simplex_tpu.io.native import load_lp_fast

    A, b, c = load_lp_fast(path)  # native mmap parser, python fallback
    return (A, b, c, None), 0.0, True


def _parse_reopt_spec(spec: str, m: int):
    """'i=delta[,i=delta...]' -> (m,) delta vector, or None on a bad spec."""
    db = np.zeros(m, np.float64)
    try:
        for part in spec.split(","):
            i_s, d_s = part.split("=")
            db[int(i_s)] = float(d_s)
    except (ValueError, IndexError) as exc:
        print(f"error: bad --reoptimize spec: {exc}", file=sys.stderr)
        return None
    return db


def _resolve_flag_defaults(args) -> None:
    """Resolve the None-sentinel tuning flags in place.

    --fast fills the flagship defaults, otherwise the plain defaults apply;
    a flag the user passed explicitly (even an explicit 0) always wins —
    argparse can't distinguish an explicit default from an unset flag, so
    the parser defaults are None and this resolves them post-parse.
    """
    if not hasattr(args, "pricing_dtype"):
        return
    fast = getattr(args, "fast", False)
    if args.pricing_dtype is None:
        args.pricing_dtype = "bfloat16" if fast else "float32"
    if args.update_defer is None:
        args.update_defer = 16 if fast else 0
    if args.partial_pricing is None:
        args.partial_pricing = 8 if fast else 0
    if args.refactor_every is None:
        args.refactor_every = 1024 if fast else 0
    if getattr(args, "multi_price", None) is None:
        # measured round 5 (v5e, 8192x16384): K=64 multiple pricing cuts the
        # full-solve pivoting wall 4.81 s -> 3.38 s vs the S8/L16 flagship
        # (exact objective match); K=32 refills twice as often for the same
        # pivot path. Part of --fast since round 5 — dantzig only (steepest
        # rejects the composition; devex ignores it but would still size the
        # deferred buffers by K).
        dantzig = getattr(args, "pricing", "dantzig") == "dantzig"
        args.multi_price = 64 if (fast and dantzig) else 0


def _options(args):
    import jax.numpy as jnp

    from simplex_tpu.config import SimplexOptions

    return SimplexOptions(
        dtype=jnp.float64 if args.fp64 else jnp.float32,
        backend=args.backend,
        pricing=getattr(args, "pricing", "dantzig"),
        pricing_dtype=getattr(args, "pricing_dtype", "float32"),
        update_defer=getattr(args, "update_defer", 0),
        partial_pricing=getattr(args, "partial_pricing", 0),
        ratio=getattr(args, "ratio", "harris"),
        multi_price=getattr(args, "multi_price", 0) or 0,
        max_iter=args.max_iter,
        refactor_every=args.refactor_every,
    )


def cmd_solve(args) -> int:
    from simplex_tpu.bench.timing import PhaseTimer
    from simplex_tpu.core.solver import solve
    from simplex_tpu.status import SolveStatus

    from simplex_tpu.core.twophase import GeneralLP, solve_general

    timer = PhaseTimer()
    if args.sparse and not (args.mps or args.input.endswith(".mps")):
        print("error: --sparse requires an MPS input (--mps)", file=sys.stderr)
        return 1
    with timer.phase("Read file"):
        try:
            loaded, c0, maximize = _load(args.input, args.mps, args.sparse)
        except (OSError, ValueError, NotImplementedError) as exc:
            print(f"error: {exc}", file=sys.stderr)
            return 1
    with timer.phase("Solve"):
        if isinstance(loaded, GeneralLP):
            if args.algo == "pdhg":
                # general route for the first-order mode: equality form with
                # native box bounds — no feasible basis, no artificials
                from simplex_tpu.fo import solve_pdhg
                from simplex_tpu.io.canonical import to_equality_form

                try:
                    eq = to_equality_form(loaded)
                except ValueError as exc:
                    print(f"error: {exc}", file=sys.stderr)
                    return 1
                res = solve_pdhg(
                    eq.A.astype(np.float32),
                    eq.b.astype(np.float32),
                    eq.c.astype(np.float32),
                    u=eq.u.astype(np.float32),
                    tol=args.pdhg_tol,
                )
                from simplex_tpu.status import SolveStatus as _SS

                if args.crossover and res.status == _SS.OPTIMAL:
                    from simplex_tpu.fo.crossover import crossover

                    vert = crossover(
                        eq.A.astype(np.float32), eq.b.astype(np.float32),
                        eq.c.astype(np.float32), res,
                        u=eq.u.astype(np.float32), options=_options(args),
                    )
                    res = res._replace(
                        z=vert.z, x=vert.x, status=vert.status,
                        iters=res.iters + vert.iters,
                    )
                # map back to the caller's variables (undo shift/reflect/
                # split) and restore the objective constant
                res = res._replace(
                    z=res.z + eq.z_const,
                    x=eq.recover(np.asarray(res.x)[: eq.k_transformed]),
                )
            else:
                res = solve_general(loaded, options=_options(args), presolve=getattr(args, 'presolve', False))
        elif args.algo == "pdhg":
            from simplex_tpu.fo import solve_pdhg

            A, b, c, _basis0 = loaded
            res = solve_pdhg(A, b, c, tol=args.pdhg_tol)
            if args.crossover and res.status == SolveStatus.OPTIMAL:
                from simplex_tpu.fo.crossover import crossover

                vert = crossover(A, b, c, res, options=_options(args))
                res = res._replace(
                    z=vert.z, x=vert.x, status=vert.status,
                    iters=res.iters + vert.iters,
                )
        else:
            A, b, c, basis0 = loaded
            res = solve(A, b, c, basis0=basis0, options=_options(args))

    with timer.phase("Print result"):
        if res.status == SolveStatus.OPTIMAL:
            # same shape of report as the reference main(); the objective is
            # reported in the instance's own sense (res.z is always the max)
            obj = (res.z if maximize else -res.z) + c0
            print(f"Optimum found: {obj:g}")
            if getattr(res, "feas_err", 0.0) > 1e-5:
                print(f"\twarning: primal infeasibility {res.feas_err:.2e}")
            if isinstance(loaded, GeneralLP):
                for i, v in enumerate(res.x):
                    print(f"\tx_{i} = {v:g}")
            elif hasattr(res, "basis"):
                for i in range(len(res.basis)):
                    print(f"\tx_{int(res.basis[i])} = {res.x_b[i]:g}")
            else:  # first-order result: no basis, print the support
                for i in np.flatnonzero(np.abs(res.x) > 1e-9):
                    print(f"\tx_{int(i)} = {res.x[i]:g}")
        else:
            print(res.status.describe())
        print(f"Pivots: {res.iters}")
    if args.time:
        print()
        print(timer.report())
    return 0 if res.status == SolveStatus.OPTIMAL else 2


def cmd_verify(args) -> int:
    from simplex_tpu.core.solver import solve
    from simplex_tpu.core.twophase import GeneralLP
    from simplex_tpu.oracle import get_oracle
    from simplex_tpu.oracle.reference import relative_gap
    from simplex_tpu.status import SolveStatus

    loaded, _c0, _max = _load(args.input, args.mps)
    # NB: GeneralLP is a NamedTuple (a tuple subclass) — test for it, not
    # for tuple-ness
    if not isinstance(loaded, GeneralLP):
        A, b, c, basis0 = loaded
        res = solve(A, b, c, basis0=basis0, options=_options(args))
        oracle = get_oracle(args.oracle)
        ref = oracle(A, b, c)
    else:
        # general route (mixed rows / bounds): two-phase vs HiGHS on the
        # same general form — the automated version of the reference's
        # manual GLPK comparison on full MPS (solver_glpk.cpp:27-36)
        from simplex_tpu.core.twophase import solve_general
        from simplex_tpu.oracle.reference import solve_scipy_general

        res = solve_general(loaded, options=_options(args), presolve=getattr(args, 'presolve', False))
        ref = solve_scipy_general(loaded)
    if res.status != ref.status:
        print(f"STATUS MISMATCH: ours={res.status.name} oracle={ref.status.name}")
        return 1
    if res.status == SolveStatus.OPTIMAL:
        gap = relative_gap(res.z, ref.z)
        ok = gap < args.gap
        print(
            f"ours={res.z:.9g} oracle={ref.z:.9g} rel_gap={gap:.3e} "
            f"({'OK' if ok else 'FAIL'} @ {args.gap:g})"
        )
        return 0 if ok else 1
    print(f"status agreed: {res.status.name}")
    return 0


def cmd_analyze(args) -> int:
    """Solve, then report duals and sensitivity ranges (RHS/cost ranging)."""
    from simplex_tpu.analysis import ranging
    from simplex_tpu.core.solver import solve
    from simplex_tpu.core.twophase import GeneralLP
    from simplex_tpu.status import SolveStatus

    use_sparse = getattr(args, "sparse", False)
    if use_sparse and not (args.mps or args.input.endswith(".mps")):
        print("error: --sparse requires an MPS input (--mps)", file=sys.stderr)
        return 1
    loaded, c0, maximize = _load(args.input, args.mps, use_sparse)
    if isinstance(loaded, GeneralLP):
        # general route: duals from solve_general; RHS/cost RANGES need the
        # canonical basis machinery and are not derived here, but warm
        # re-solves work through the GeneralWarmStart token
        from simplex_tpu.core.twophase import solve_general

        res = solve_general(loaded, options=_options(args), presolve=getattr(args, 'presolve', False))
        if res.status != SolveStatus.OPTIMAL:
            print(res.status.describe())
            return 2
        sgn = 1.0 if maximize else -1.0
        print(f"Optimum: {sgn * res.z + c0:g}  ({res.iters} pivots)")
        print("\nrow  dual y_i  (general route: ranging not available)")
        for i, yi in enumerate(res.y):
            print(f"{i:>3}  {sgn * yi:>10.6g}")
        if args.reoptimize:
            db = _parse_reopt_spec(args.reoptimize, len(loaded.b))
            if db is None:
                return 1
            lp2 = loaded._replace(b=np.asarray(loaded.b, np.float64) + db)
            warm = solve_general(lp2, options=_options(args), warm=res.warm)
            if warm.status != SolveStatus.OPTIMAL:
                print(f"\nre-solve: {warm.status.describe()}")
                return 2
            print(
                f"\nre-solve optimum: {sgn * warm.z + c0:g}  "
                f"({warm.iters} warm pivots, 0 phase-1, vs {res.iters} cold)"
            )
        return 0
    A, b, c, basis0 = loaded
    res = solve(A, b, c, basis0=basis0, options=_options(args))
    if res.status != SolveStatus.OPTIMAL:
        print(res.status.describe())
        return 2
    rng = ranging(A, b, c, res.basis)
    # report everything in the instance's OWN optimization sense: the
    # solver maximizes; a minimize MPS had its costs negated by _load, so
    # duals and cost ranges flip sign (delta-c ranges negate AND swap ends)
    sgn = 1.0 if maximize else -1.0
    obj = sgn * res.z + c0
    y = sgn * rng.y
    c_lo = rng.c_lo if maximize else -rng.c_hi
    c_hi = rng.c_hi if maximize else -rng.c_lo
    print(f"Optimum: {obj:g}  ({res.iters} pivots)")
    print("\nrow  dual y_i      allowable delta-b_i (basis unchanged)")
    for i in range(len(b)):
        print(f"{i:>3}  {y[i]:>10.6g}  [{rng.b_lo[i]:>10.4g}, {rng.b_hi[i]:>10.4g}]")
    k = min(len(c), args.top_cols)
    print(f"\ncol  x_j         allowable delta-c_j (first {k} columns)")
    for j in range(k):
        print(f"{j:>3}  {rng.x[j]:>10.6g}  [{c_lo[j]:>10.4g}, {c_hi[j]:>10.4g}]")
    if args.reoptimize:
        from simplex_tpu.analysis import reoptimize

        db = _parse_reopt_spec(args.reoptimize, len(b))
        if db is None:
            return 1
        b2 = (np.asarray(b, np.float64) + db).astype(np.asarray(b).dtype)
        inside = np.all((db >= rng.b_lo - 1e-9) & (db <= rng.b_hi + 1e-9))
        warm = reoptimize(np.asarray(A), b2, c, res, options=_options(args))
        print(
            f"\nreoptimize: delta-b {'inside' if inside else 'OUTSIDE'} the "
            f"allowable range -> {'same basis expected' if inside else 'dual pivots expected'}"
        )
        if warm.status != SolveStatus.OPTIMAL:
            print(f"re-solve: {warm.status.describe()}")
            return 2
        print(
            f"re-solve optimum: {sgn * warm.z + c0:g}  "
            f"({warm.iters} warm pivots vs {res.iters} cold)"
        )
    return 0


def cmd_trace(args) -> int:
    from simplex_tpu.core.trace import print_trace
    from simplex_tpu.core.twophase import GeneralLP

    loaded, _c0, _max = _load(args.input, args.mps)
    if isinstance(loaded, GeneralLP):  # NamedTuple: isinstance-of-tuple lies
        print("error: trace mode requires a canonical-form input", file=sys.stderr)
        return 1
    A, b, c, basis0 = loaded
    print_trace(A, b, c, basis0=basis0, options=_options(args), verbose=args.verbose)
    return 0


def cmd_bench(args) -> int:
    import subprocess

    cmd = [
        sys.executable,
        "bench.py",
        "--m", str(args.m), "--n", str(args.n),
        "--pivots", str(args.pivots), "--backend", args.backend,
    ]
    return subprocess.call(cmd)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="simplex_tpu")
    sub = ap.add_subparsers(dest="cmd", required=True)

    def common(p):
        p.add_argument("--backend", default="xla", choices=["xla", "pallas"])
        p.add_argument("--pricing", default="dantzig", choices=["dantzig", "devex", "steepest"])
        p.add_argument("--fp64", action="store_true")
        p.add_argument("--cpu", action="store_true", help="force the CPU backend")
        p.add_argument("--max-iter", type=int, default=0)
        p.add_argument("--refactor-every", type=int, default=None)
        # None = "not set by the user" so --fast can fill in its defaults
        # without clobbering explicit values (even explicit zeros)
        p.add_argument(
            "--pricing-dtype", default=None, choices=["float32", "bfloat16"],
            help="price against a bf16 shadow of A (exact-termination fallback)",
        )
        p.add_argument(
            "--update-defer", type=int, default=None, metavar="L",
            help="batch L rank-1 B_inv updates into one rank-L GEMM",
        )
        p.add_argument(
            "--partial-pricing", type=int, default=None, metavar="S",
            help="price 1/S of the columns per pivot (exact fallback)",
        )
        p.add_argument(
            "--multi-price", type=int, default=None, metavar="K",
            help="K-candidate multiple pricing (one (m,m)x(m,K) ftran GEMM "
                 "per refill amortizes the per-pivot m^2 read; composes "
                 "with --update-defer and --partial-pricing)",
        )
        p.add_argument(
            "--ratio", default="harris", choices=["harris", "classic"],
            help="ratio test (harris = stabilized two-pass, the default)",
        )
        p.add_argument(
            "--log-level", default=None,
            choices=["debug", "info", "warning", "error"],
            help="framework log verbosity (also: SIMPLEX_TPU_LOG env var; "
                 "SIMPLEX_TPU_LOG_JSON=1 for JSON lines)",
        )
        p.add_argument(
            "--presolve", action="store_true",
            help="host presolve before the general route: fixed vars, "
                 "empty rows/cols, singleton rows, geometric-mean scaling "
                 "(simplex_tpu.presolve); primal AND duals are postsolved",
        )
        p.add_argument(
            "--fast", action="store_true",
            help="shorthand for --pricing-dtype bfloat16 --update-defer 16 "
                 "--partial-pricing 8 --refactor-every 1024 "
                 "--multi-price 64 (the flagship TPU config); flags you "
                 "set explicitly are kept",
        )

    ps = sub.add_parser("solve", help="solve an LP from a file")
    ps.add_argument("input")
    ps.add_argument("--mps", action="store_true", help="input is MPS format")
    ps.add_argument("--time", action="store_true", help="print phase timings")
    ps.add_argument(
        "--algo", default="simplex", choices=["simplex", "pdhg"],
        help="pdhg = PDLP-style first-order mode (inverse-free; for "
             "instances too large for the simplex core)",
    )
    ps.add_argument(
        "--pdhg-tol", type=float, default=1e-4,
        help="relative KKT tolerance for --algo pdhg",
    )
    ps.add_argument(
        "--crossover", action="store_true",
        help="with --algo pdhg: purify the first-order point to an exact "
        "vertex (basis identification + short warm simplex cleanup)",
    )
    ps.add_argument(
        "--sparse", action="store_true",
        help="MPS inputs: keep A scipy.sparse end-to-end (sparse "
        "standardization + BlockSparse device solve; dense A never "
        "materializes). Always routes through the general pipeline.",
    )
    common(ps)
    ps.set_defaults(fn=cmd_solve)

    pv = sub.add_parser("verify", help="solve and compare against an oracle")
    pv.add_argument("input")
    pv.add_argument("--mps", action="store_true")
    pv.add_argument("--oracle", default="scipy", choices=["scipy", "native"])
    pv.add_argument("--gap", type=float, default=1e-6)
    common(pv)
    pv.set_defaults(fn=cmd_verify)

    pa = sub.add_parser(
        "analyze", help="solve + duals + RHS/cost sensitivity ranges"
    )
    pa.add_argument("input")
    pa.add_argument("--mps", action="store_true")
    pa.add_argument(
        "--top-cols", type=int, default=16,
        help="how many columns' cost ranges to print",
    )
    pa.add_argument(
        "--reoptimize", metavar="SPEC", default=None,
        help="re-solve after a RHS change via the dual simplex, warm-"
        "started from the optimal basis: SPEC is 'i=delta[,i=delta...]' "
        "(e.g. '0=+2.5,3=-1' adds 2.5 to b_0 and -1 to b_3)",
    )
    pa.add_argument(
        "--sparse", action="store_true",
        help="MPS inputs: keep A scipy.sparse end-to-end (general route)",
    )
    common(pa)
    pa.set_defaults(fn=cmd_analyze)

    pt = sub.add_parser("trace", help="per-pivot debug trace (PRINT mode)")
    pt.add_argument("input")
    pt.add_argument("--mps", action="store_true")
    pt.add_argument("--verbose", action="store_true", help="dump basis and x_b")
    common(pt)
    pt.set_defaults(fn=cmd_trace)

    pb = sub.add_parser("bench", help="run the pivots/sec benchmark")
    pb.add_argument("--m", type=int, default=8192)
    pb.add_argument("--n", type=int, default=16384)
    pb.add_argument("--pivots", type=int, default=128)
    pb.add_argument("--backend", default="xla", choices=["xla", "pallas"])
    pb.set_defaults(fn=cmd_bench)

    args = ap.parse_args(argv)
    if getattr(args, "log_level", None):
        from simplex_tpu.logging import set_level

        set_level(args.log_level)
    _resolve_flag_defaults(args)
    import jax

    if getattr(args, "cpu", False):
        jax.config.update("jax_platforms", "cpu")
    if getattr(args, "fp64", False):
        jax.config.update("jax_enable_x64", True)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
