"""First-order LP solvers (PDHG / PDLP-style) — the inverse-free mode."""

from simplex_tpu.fo.pdhg import PDHGResult, solve_pdhg

__all__ = ["PDHGResult", "solve_pdhg"]
