"""First-order LP solvers (PDHG / PDLP-style) — the inverse-free mode."""

from simplex_tpu.fo.pdhg import PDHGResult, solve_pdhg


def __getattr__(name):
    if name == "solve_pdhg_sharded":
        from simplex_tpu.fo.sharded import solve_pdhg_sharded

        return solve_pdhg_sharded
    raise AttributeError(f"module 'simplex_tpu.fo' has no attribute {name!r}")


__all__ = ["PDHGResult", "solve_pdhg", "solve_pdhg_sharded"]
