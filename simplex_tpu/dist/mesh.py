"""Mesh construction and multi-host initialization helpers.

The reference has no distributed layer at all (SURVEY.md §2.5: single GPU,
single process, zero collectives). The TPU framework's communication story is
jax.distributed (DCN, multi-host launch) + a device Mesh whose collectives
ride ICI.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np

COLS_AXIS = "cols"
BATCH_AXIS = "batch"


def make_mesh(
    axis_names: Sequence[str] = (COLS_AXIS,),
    shape: Optional[Sequence[int]] = None,
    devices: Optional[Sequence[jax.Device]] = None,
) -> jax.sharding.Mesh:
    """Build a Mesh over the available devices.

    Defaults to a 1-D mesh over all devices with axis 'cols' (the
    column-sharded large-LP mode). For the batched mode use axis 'batch'.
    """
    devices = list(devices if devices is not None else jax.devices())
    if shape is None:
        shape = (len(devices),) + (1,) * (len(axis_names) - 1)
    arr = np.asarray(devices).reshape(tuple(shape))
    return jax.sharding.Mesh(arr, tuple(axis_names))


def initialize_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Bring up multi-host JAX (DCN rendezvous; call once per process).

    Thin wrapper over ``jax.distributed.initialize`` so multi-host launch is
    part of the framework surface; on a single-host pod slice it is a no-op
    (TPU autodetection fills the arguments in real deployments).
    """
    # NOTE: do not probe jax.process_count() here — it initializes the XLA
    # backend, after which jax.distributed.initialize refuses to run.
    if jax.distributed.is_initialized():
        return  # already initialized
    explicit = coordinator_address is not None or num_processes is not None
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except (ValueError, RuntimeError):
        if explicit:
            # the caller asked for a specific rendezvous: failing to join it
            # must not degrade silently into a single-process run
            raise
        # no-arg autodetect on a single-process dev box: nothing to do
        pass
