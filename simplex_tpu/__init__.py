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

__version__ = "0.1.0"

__all__ = [
    "DEFAULT_OPTIONS",
    "Problem",
    "SimplexOptions",
    "SolveResult",
    "SolveStatus",
    "SolverState",
    "dumps_lp",
    "load_lp",
    "loads_lp",
    "save_lp",
    "solve",
    "__version__",
]
