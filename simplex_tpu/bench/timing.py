"""Phase timing: the reference's ``TimeStruct`` (src/v1_baseline.cu:35-46,
report :521-536) rebuilt for an async runtime.

The reference's in-loop timers measure kernel *launch* time, not completion
(no synchronize before reading the clock — SURVEY.md §5), so its per-phase
numbers are unreliable. Here:

  * host-visible phases (read / transfer / compile / solve / fetch) are timed
    with ``block_until_ready`` fences around each phase;
  * the in-loop y / p(ricing) / B_inv / x_b breakdown — which lives inside one
    fused XLA loop and cannot be fenced from the host — is measured by the
    device-side scan harness in :mod:`simplex_tpu.bench.kernels`;
  * ``trace()`` wraps a block in ``jax.profiler`` for a real timeline.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Optional

import jax


class PhaseTimer:
    """Accumulating named-phase wall-clock timer with device fencing."""

    def __init__(self) -> None:
        self.durations: Dict[str, float] = {}
        self._order = []

    @contextlib.contextmanager
    def phase(self, name: str, fence=None):
        """Time a phase; ``fence`` (array/pytree) is blocked on before stop."""
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if fence is not None:
                jax.block_until_ready(fence)
            dt = time.perf_counter() - t0
            if name not in self.durations:
                self._order.append(name)
            self.durations[name] = self.durations.get(name, 0.0) + dt

    def fence(self, name: str, value):
        """Block on ``value`` and charge the wait to ``name``."""
        t0 = time.perf_counter()
        jax.block_until_ready(value)
        dt = time.perf_counter() - t0
        if name not in self.durations:
            self._order.append(name)
        self.durations[name] = self.durations.get(name, 0.0) + dt
        return value

    def report(self) -> str:
        """Formatted phase report (the reference's exit report, made honest)."""
        total = sum(self.durations.values())
        lines = [f"{'Total':>16s}: {total:8.3f} s"]
        for name in self._order:
            lines.append(f"{name:>16s}: {self.durations[name]:8.3f} s")
        return "\n".join(lines)


@contextlib.contextmanager
def trace(log_dir: Optional[str] = None):
    """jax.profiler trace around a block (viewable in TensorBoard/XProf)."""
    if log_dir is None:
        yield
        return
    with jax.profiler.trace(log_dir):
        yield
