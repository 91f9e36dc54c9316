"""The scaling modes in one script: vmap-batched, 1-D sharded, 2-D sharded,
and first-order — all on whatever devices are available.

Run on a faked multi-device CPU for a laptop demo:
  XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python examples/batch_and_distributed.py --cpu
On a real pod slice the same code uses the chips.
"""

import sys

import jax
import numpy as np

if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")

from simplex_tpu import solve_batched, solve_sharded
from simplex_tpu.dist.mesh import make_mesh
from simplex_tpu.fo import solve_pdhg
from simplex_tpu.oracle.generator import random_dense_lp


def main() -> None:
    devices = jax.devices()
    print(f"{len(devices)} device(s): {devices[0].platform}")

    # --- batched: many independent LPs, batch axis sharded ---
    B, m, n = 4 * len(devices), 16, 48
    A0, b0, c0 = random_dense_lp(m, n, seed=0, dtype=np.float32)
    rng = np.random.default_rng(0)
    As = np.stack([A0] * B)
    bs = np.stack([b0 + 0.01 * np.abs(rng.standard_normal(m)) for _ in range(B)])
    cs = np.stack([c0] * B)
    batch_mesh = make_mesh(axis_names=("batch",), devices=devices)
    batch = solve_batched(As, bs, cs, mesh=batch_mesh)
    mesh = make_mesh(devices=devices)  # 'cols' axis for the sharded modes
    print(f"batched: {B} LPs, z[0..3] = {np.round(np.asarray(batch.z[:4]), 4)}")

    # --- one LP, columns sharded over every device ---
    m2, n2 = 16, 16 * len(devices)
    A, b, c = random_dense_lp(m2, n2, seed=1, dtype=np.float32)
    res = solve_sharded(A, b, c, mesh)
    print(f"1-D sharded: z = {res.z:.6f} ({res.iters} pivots)")

    # --- 2-D decomposition (needs an even device count) ---
    if len(devices) >= 2 and len(devices) % 2 == 0:
        from simplex_tpu import solve_sharded_2d

        mesh2 = make_mesh(
            axis_names=("rows", "cols"),
            shape=(2, len(devices) // 2),
            devices=devices,
        )
        m3, n3 = 16, 8 * len(devices)
        A3, b3, c3 = random_dense_lp(m3, n3, seed=2, dtype=np.float32)
        res2 = solve_sharded_2d(A3, b3, c3, mesh2)
        print(f"2-D sharded: z = {res2.z:.6f} ({res2.iters} pivots)")

    # --- first-order mode: no inverse at all ---
    fo = solve_pdhg(A, b, c, tol=1e-5)
    print(f"pdhg: z = {fo.z:.6f} ({fo.iters} iterations, "
          f"kkt = {max(fo.primal_res, fo.dual_res, fo.gap):.1e})")


if __name__ == "__main__":
    main()
