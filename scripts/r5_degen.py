"""VERDICT r4 #2: multi-price refill cadence on a degenerate 8k workload.

The uncapped degenerate-streak instance at 8192x16384 runs >39k pivots with
a >12k-long degenerate streak (perturbation re-arm cap exhausted, Bland
latched) — hours of wall clock. This probe runs FIXED 8192-pivot budgets
for flagship vs multi_price=64 and records pivots/s, objective progress,
and the refill cadence (cand.seg / iters) so the degeneracy policy is
chosen from numbers.
"""

import dataclasses
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
import bench  # noqa: E402

bench.setup_compile_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from simplex_tpu.config import SimplexOptions  # noqa: E402
from simplex_tpu.core.solver import _solve_jit  # noqa: E402
from simplex_tpu.oracle.generator import degenerate_streak_lp  # noqa: E402

m, n = 8192, 16384
print(f"devices: {jax.devices()}", flush=True)
A, b, c = degenerate_streak_lp(m, n, seed=0)
Ad, bd, cd = jax.device_put((A, b, c))
jax.block_until_ready(Ad)
basis0 = jnp.arange(n - m, n, dtype=jnp.int32)
BUDGET = 8192

base = SimplexOptions(
    pricing_dtype="bfloat16", update_defer=16, partial_pricing=8,
    refactor_every=1024, max_iter=BUDGET,
)
for name, o in [
    ("degen_k0", base),
    ("degen_k64", dataclasses.replace(base, multi_price=64)),
]:
    opts = dataclasses.replace(o, max_iter=0)  # budget stays traced
    t0 = time.time()
    st = _solve_jit(Ad, bd, cd, basis0, opts, jnp.int32(2), True)
    float(st.x_b.sum())
    warm = time.time() - t0
    t0 = time.time()
    st = _solve_jit(Ad, bd, cd, basis0, opts, jnp.int32(BUDGET), True)
    float(st.x_b.sum())
    dt = time.time() - t0
    iters = int(st.iters)
    z = float(jnp.dot(st.c_b, st.x_b))
    refills = int(st.cand.seg) if st.cand is not None else 0
    pert = int(st.pert.rounds) if st.pert is not None else 0
    print(
        f"{name}: {iters} pivots in {dt:.2f}s -> {iters/dt:.0f} p/s  "
        f"z={z:.6f} status={int(st.status)} degen_streak={int(st.degen)} "
        f"refills={refills} ({refills/max(iters,1):.3f}/pivot) "
        f"pert_rounds={pert} warm={warm:.0f}s",
        flush=True,
    )
