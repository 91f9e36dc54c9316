"""Dissect the flagship full-solve wall clock at 8192x16384 (round 5).

Same-session control measured 8.27 s to OPTIMAL for 4,571 pivots — but the
pure pivot rate is ~1,580 p/s (2.9 s), so ~5.4 s is overhead (in-loop
refactors, terminal verify rounds, host polish, chunk boundaries). Each
variant below removes one contributor; the deltas localize the cost.

Usage: python scripts/r5_dissect.py [m] [n]   (writes to stdout)
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
from simplex_tpu.oracle.generator import random_dense_lp  # noqa: E402

m = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
n = int(sys.argv[2]) if len(sys.argv) > 2 else 16384
print(f"devices: {jax.devices()}", flush=True)
A, b, c = random_dense_lp(m, n, seed=0, dtype=np.float32)
A_dev, b_dev, c_dev = jax.device_put((A, b, c))
jax.block_until_ready(A_dev)
np.asarray(A_dev)  # seed host cache for the polish fallback

base = SimplexOptions(
    pricing_dtype="bfloat16", update_defer=16, partial_pricing=8,
    refactor_every=1024, checkpoint_every=2048,
)
variants = {
    "default": base,
    "nopolish": dataclasses.replace(base, polish=False),
    "noverify_nopolish": dataclasses.replace(
        base, polish=False, verify_terminal=False
    ),
    "onechunk_nopolish": dataclasses.replace(
        base, polish=False, checkpoint_every=65536
    ),
    "norefac_nopolish": dataclasses.replace(
        base, polish=False, refactor_every=0
    ),
    # multi-price K=64 with the round-5 refill gather dedup (recheck's
    # gathered columns threaded to the ftran — one full-A pass less/refill)
    "mp64": dataclasses.replace(base, multi_price=64),
}
for name, o in variants.items():
    t0 = time.time()
    solve_with_checkpoints(
        A_dev, b_dev, c_dev, path=f"/tmp/r5/{name}_warm.npz",
        options=dataclasses.replace(o, max_iter=2), resume=False,
    )
    warm = time.time() - t0
    marks = []
    t0 = time.time()
    res = solve_with_checkpoints(
        A_dev, b_dev, c_dev, path=f"/tmp/r5/{name}.npz", options=o,
        resume=False,
        on_chunk=lambda st: marks.append(
            (int(st.iters), round(time.time() - t0, 2))
        ),
    )
    dt = time.time() - t0
    print(
        f"{name}: {dt:.2f}s iters={res.iters} {res.status.name} "
        f"z={res.z:.8f} feas={res.feas_err:.1e} warm={warm:.1f}s "
        f"chunks={marks}",
        flush=True,
    )
