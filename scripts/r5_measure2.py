"""Round-5 measurement pass 2 (after the no-flush refill + polish fixes).

Covers VERDICT r4 items #1 (multi-price full-solve time-to-optimal), #2
(degenerate-workload characterization), and #7 (steepest-edge at 8k).
All runs pass A_host so the polish never pulls A back over the tunnel.
"""

import dataclasses
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
import bench  # noqa: E402

bench.setup_compile_cache()

import jax  # noqa: E402

from simplex_tpu.config import SimplexOptions  # noqa: E402
from simplex_tpu.core.checkpoint import solve_with_checkpoints  # noqa: E402
from simplex_tpu.oracle.generator import (  # noqa: E402
    degenerate_streak_lp,
    random_dense_lp,
)

m, n = 8192, 16384
print(f"devices: {jax.devices()}", flush=True)
A, b, c = random_dense_lp(m, n, seed=0, dtype=np.float32)
Ad, bd, cd = jax.device_put((A, b, c))
jax.block_until_ready(Ad)
Ag, bg, cg = degenerate_streak_lp(m, n, seed=0)
Agd, bgd, cgd = jax.device_put((Ag, bg, cg))
jax.block_until_ready(Agd)

base = SimplexOptions(
    pricing_dtype="bfloat16", update_defer=16, partial_pricing=8,
    refactor_every=1024, checkpoint_every=2048,
)
variants = [
    ("default", base, (Ad, bd, cd, A)),
    ("mp64", dataclasses.replace(base, multi_price=64), (Ad, bd, cd, A)),
    ("mp32", dataclasses.replace(base, multi_price=32), (Ad, bd, cd, A)),
    (
        "steepest",
        dataclasses.replace(
            base, pricing="steepest", pricing_dtype="float32",
            update_defer=0, partial_pricing=0,
        ),
        (Ad, bd, cd, A),
    ),
    ("degen_k0", base, (Agd, bgd, cgd, Ag)),
    (
        "degen_k64",
        dataclasses.replace(base, multi_price=64),
        (Agd, bgd, cgd, Ag),
    ),
]
for name, o, (AA, bb, cc, AH) in variants:
    t0 = time.time()
    solve_with_checkpoints(
        AA, bb, cc, path=f"/tmp/r5/m2_{name}_warm.npz",
        options=dataclasses.replace(o, max_iter=2), resume=False, A_host=AH,
    )
    warm = time.time() - t0
    marks = []
    t0 = time.time()
    res = solve_with_checkpoints(
        AA, bb, cc, path=f"/tmp/r5/m2_{name}.npz", options=o, resume=False,
        A_host=AH,
        on_chunk=lambda st: marks.append(
            (int(st.iters), round(time.time() - t0, 2))
        ),
    )
    dt = time.time() - t0
    pps = res.iters / dt if dt > 0 else float("nan")
    print(
        f"{name}: {dt:.2f}s iters={res.iters} -> {pps:.0f} p/s "
        f"{res.status.name} z={res.z:.8f} feas={res.feas_err:.1e} "
        f"warm={warm:.1f}s chunks={marks}",
        flush=True,
    )
