"""Solver status codes.

Mirrors the reference's ``SolveStatus`` enum (``src/v1_baseline.cu:48-53``:
MaxIter, OptimumFound, Unbounded, ThetaOverflow) but as integer codes usable
as traced scalars inside ``lax.while_loop`` — the TPU solver carries the
status in the solver-state pytree instead of returning it from host code.

``RUNNING`` is new (the reference encodes "still running" implicitly by being
inside the loop). ``SINGULAR`` generalizes the reference's ``ThetaOverflow``
(v1's ``alpha_q <= 0`` guard, ``src/v1_baseline.cu:268-284``) to any
numerically-unusable pivot element.
"""

from __future__ import annotations

import enum


class SolveStatus(enum.IntEnum):
    """Integer status codes carried through the jitted pivot loop."""

    RUNNING = 0
    OPTIMAL = 1
    UNBOUNDED = 2
    MAX_ITER = 3
    SINGULAR = 4  # pivot element too small (reference: ThetaOverflow)
    INFEASIBLE = 5  # no feasible point: phase-1 optimum < 0, a PDHG Farkas
    # certificate, or an unbounded dual in the dual simplex

    def describe(self) -> str:
        return {
            SolveStatus.RUNNING: "Still running.",
            SolveStatus.OPTIMAL: "Optimum found.",
            SolveStatus.UNBOUNDED: "Problem unbounded.",
            SolveStatus.MAX_ITER: "MAX_ITER exceeded.",
            SolveStatus.SINGULAR: "Pivot element too small (theta overflow).",
            SolveStatus.INFEASIBLE: "Problem infeasible.",
        }[self]
