"""Two-process jax.distributed bring-up (the DCN rendezvous path).

Round-1 verdict item #7: ``initialize_multihost`` existed but no test
exercised a >= 2-process ``jax.distributed`` rendezvous. Here two spawned
processes (2 CPU devices each) rendezvous through a coordinator, build one
global 4-device mesh, and run the 1-D column-sharded solve ACROSS the
process boundary — the collectives cross the inter-process transport, which
is exactly what DCN is on a real multi-host pod (SURVEY.md §4(d)).
"""

import socket
import subprocess
import sys

import numpy as np
import pytest

_WORKER = r"""
import sys
import jax

jax.config.update("jax_platforms", "cpu")

coord, pid = sys.argv[1], int(sys.argv[2])

from simplex_tpu.dist.mesh import initialize_multihost

initialize_multihost(
    coordinator_address=coord, num_processes=2, process_id=pid
)
assert jax.process_count() == 2, f"rendezvous failed: {jax.process_count()}"
assert jax.device_count() == 4, jax.device_count()

import numpy as np

from simplex_tpu.dist.mesh import make_mesh
from simplex_tpu.dist.sharded import solve_sharded
from simplex_tpu.oracle.generator import random_dense_lp
from simplex_tpu.status import SolveStatus

# identical instance in both processes; mesh spans BOTH processes' devices
A, b, c = random_dense_lp(8, 16, seed=21, dtype=np.float32)
mesh = make_mesh(devices=jax.devices())
res = solve_sharded(A, b, c, mesh)
assert res.status == SolveStatus.OPTIMAL, res.status
print(f"RESULT {pid} {res.z:.9e}", flush=True)
"""


def test_two_process_distributed_solve(tmp_path):
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coord = f"127.0.0.1:{port}"

    env = {
        "PATH": "/usr/bin:/bin",
        "HOME": "/root",
        "JAX_PLATFORMS": "cpu",
        "XLA_FLAGS": "--xla_force_host_platform_device_count=2",
        "PYTHONPATH": ".",
    }
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _WORKER, coord, str(pid)],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            env=env,
            cwd=".",
        )
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
        assert p.returncode == 0, f"worker failed:\n{out}"

    zs = []
    for out in outs:
        for line in out.splitlines():
            if line.startswith("RESULT"):
                zs.append(float(line.split()[2]))
    assert len(zs) == 2, outs
    # both controllers computed the same optimum through the global mesh
    assert zs[0] == zs[1]

    from simplex_tpu.oracle.generator import random_dense_lp
    from simplex_tpu.oracle.reference import relative_gap, solve_scipy

    A, b, c = random_dense_lp(8, 16, seed=21, dtype=np.float32)
    ref = solve_scipy(A, b, c)
    assert relative_gap(zs[0], ref.z) < 1e-5
