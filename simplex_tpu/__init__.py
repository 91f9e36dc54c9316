"""simplex_tpu — a TPU-native dense revised simplex LP solver framework.

Built from scratch in JAX/XLA/Pallas with the capabilities of the CUDA
reference Girjoaba/simplex_method_gpu (see SURVEY.md). Public API:

    from simplex_tpu import solve, SimplexOptions, SolveStatus, load_lp
    result = solve(A, b, c)                     # max c.x s.t. Ax=b, x>=0

Subpackages:
    core     state pytree, pivot step, lax.while_loop driver
    kernels  XLA and Pallas implementations of the hot ops
    io       reference text format, MPS reader, canonicalization
    batch    vmap-batched multi-LP solve
    dist     mesh / shard_map column-sharded solve
    oracle   native C++ double-precision oracle + random LP generator
    bench    phase timing and benchmark harness
"""

from simplex_tpu.config import DEFAULT_OPTIONS, SimplexOptions
from simplex_tpu.core.solver import SolveResult, solve
from simplex_tpu.core.state import Problem, SolverState
from simplex_tpu.io.text import dumps_lp, load_lp, loads_lp, save_lp
from simplex_tpu.status import SolveStatus


def __getattr__(name):
    # lazy heavyweight entry points (import jax transitively)
    if name == "solve_batched":
        from simplex_tpu.batch.vmapped import solve_batched

        return solve_batched
    if name == "reoptimize_batched":
        from simplex_tpu.batch.vmapped import reoptimize_batched

        return reoptimize_batched
    if name == "solve_sharded":
        from simplex_tpu.dist.sharded import solve_sharded

        return solve_sharded
    if name == "solve_sharded_2d":
        from simplex_tpu.dist.sharded2d import solve_sharded_2d

        return solve_sharded_2d
    if name == "solve_general":
        from simplex_tpu.core.twophase import solve_general

        return solve_general
    if name == "GeneralLP":
        from simplex_tpu.core.twophase import GeneralLP

        return GeneralLP
    if name == "presolve":
        from simplex_tpu.presolve import presolve

        return presolve
    if name == "postsolve":
        from simplex_tpu.presolve import postsolve

        return postsolve
    if name == "read_mps":
        from simplex_tpu.io.mps import read_mps

        return read_mps
    if name == "solve_pdhg":
        from simplex_tpu.fo import solve_pdhg

        return solve_pdhg
    if name == "crossover":
        from simplex_tpu.fo.crossover import crossover

        return crossover
    if name == "ranging":
        from simplex_tpu.analysis import ranging

        return ranging
    if name == "solve_dual":
        from simplex_tpu.core.dual import solve_dual

        return solve_dual
    if name == "BlockSparse":
        from simplex_tpu.sparse import BlockSparse

        return BlockSparse
    if name == "reoptimize":
        from simplex_tpu.analysis import reoptimize

        return reoptimize
    if name == "solve_with_checkpoints":
        from simplex_tpu.core.checkpoint import solve_with_checkpoints

        return solve_with_checkpoints
    if name == "trace_pivots":
        from simplex_tpu.core.trace import trace_pivots

        return trace_pivots
    raise AttributeError(f"module 'simplex_tpu' has no attribute {name!r}")

__version__ = "0.2.0"

__all__ = [
    "BlockSparse",
    "DEFAULT_OPTIONS",
    "crossover",
    "GeneralLP",
    "read_mps",
    "Problem",
    "SimplexOptions",
    "SolveResult",
    "SolveStatus",
    "SolverState",
    "dumps_lp",
    "load_lp",
    "loads_lp",
    "save_lp",
    "ranging",
    "reoptimize",
    "reoptimize_batched",
    "solve",
    "solve_dual",
    "solve_batched",
    "solve_pdhg",
    "solve_general",
    "presolve",
    "postsolve",
    "solve_sharded",
    "solve_sharded_2d",
    "solve_with_checkpoints",
    "trace_pivots",
    "__version__",
]
