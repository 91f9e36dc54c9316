"""Test configuration: run everything on CPU with 8 virtual devices so the
multi-chip sharding paths are exercised without TPU hardware (SURVEY.md §4:
`xla_force_host_platform_device_count` mesh faking stands in for multi-node).

Must set env vars before the first `import jax` anywhere in the test run.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# The axon site hook re-pins JAX_PLATFORMS at interpreter start, so the env
# var alone does not stick — override through the config API as well.
jax.config.update("jax_platforms", "cpu")

# Tests compare against double-precision oracles; allow f64 arrays when a
# test requests dtype=float64 (solver default stays fp32, like the reference).
jax.config.update("jax_enable_x64", True)
