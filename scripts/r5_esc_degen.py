"""Perturbation ESCALATION probe on the degenerate 8k workload.

Round-5 TUNING.md recorded that the 8192x16384 degenerate-streak instance
made ZERO objective progress in 8,192 pivots and exhausted all 16
perturbation re-arms at the fixed base scale (1e-4-relative shifts cannot
split this instance's tie structure). This probe runs the SAME fixed
8192-pivot budget with the round-5 geometric escalation
(``SimplexOptions.perturb_grow``: activation k uses scale * grow^min(k,10))
against the legacy fixed scale, and records objective progress, the re-arm
count, and the live degenerate streak — the policy evidence for the
default.
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
    refactor_every=1024,
)
for name, o in [
    ("grow1_legacy", dataclasses.replace(base, perturb_grow=1.0)),
    ("grow2_default", base),  # perturb_grow=2.0 is the round-5 default
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
    pert = int(st.pert.rounds) if st.pert is not None else 0
    print(
        f"{name}: {iters} pivots in {dt:.2f}s -> {iters/dt:.0f} p/s  "
        f"z={z:.6f} status={int(st.status)} degen_streak={int(st.degen)} "
        f"pert_rounds={pert} warm={warm:.1f}s",
        flush=True,
    )
