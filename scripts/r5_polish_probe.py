"""Localize the post-solve tail: time each stage of the finalize path."""

import dataclasses
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
import bench  # noqa: E402

bench.setup_compile_cache()

import jax  # noqa: E402

import simplex_tpu.core.checkpoint as ck  # noqa: E402
import simplex_tpu.core.solver as sv  # noqa: E402
from simplex_tpu.config import SimplexOptions  # noqa: E402
from simplex_tpu.oracle.generator import random_dense_lp  # noqa: E402


def wrap(mod, name):
    orig = getattr(mod, name)

    def timed(*a, **k):
        t = time.perf_counter()
        r = orig(*a, **k)
        print(f"  [{name}] {time.perf_counter()-t:.2f}s", flush=True)
        return r

    setattr(mod, name, timed)


wrap(sv, "_polish_refine")
wrap(sv, "_host_basis_cols")
wrap(ck, "save_checkpoint")
wrap(ck, "_chunk_jit")

_orig_get = jax.device_get


def timed_get(x):
    t = time.perf_counter()
    r = _orig_get(x)
    dt = time.perf_counter() - t
    if dt > 0.05:
        sz = sum(
            getattr(v, "nbytes", 0) for v in jax.tree_util.tree_leaves(r)
        )
        print(f"  [device_get] {dt:.2f}s ({sz/2**20:.1f} MiB)", flush=True)
    return r


jax.device_get = timed_get
ck.jax.device_get = timed_get

m, n = 8192, 16384
print(f"devices: {jax.devices()}", flush=True)
A, b, c = random_dense_lp(m, n, seed=0, dtype=np.float32)
Ad, bd, cd = jax.device_put((A, b, c))
jax.block_until_ready(Ad)
base = SimplexOptions(
    pricing_dtype="bfloat16", update_defer=16, partial_pricing=8,
    refactor_every=1024, checkpoint_every=2048,
)
ck.solve_with_checkpoints(
    Ad, bd, cd, path="/tmp/r5/probe_warm.npz",
    options=dataclasses.replace(base, max_iter=2), resume=False, A_host=A,
)
print("--- timed ---", flush=True)
t0 = time.perf_counter()
res = ck.solve_with_checkpoints(
    Ad, bd, cd, path="/tmp/r5/probe.npz", options=base, resume=False,
    A_host=A,
)
print(
    f"total {time.perf_counter()-t0:.2f}s iters={res.iters} "
    f"{res.status.name} z={res.z:.8f}",
    flush=True,
)
