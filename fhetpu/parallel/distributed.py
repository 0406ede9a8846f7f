"""Multi-host initialization (SURVEY.md 2.3: jax.distributed over DCN).

The reference's "distribution" is a file handoff between two processes;
here, multiple hosts of a pod slice join one jax.distributed job and the
same mesh axes (dp over blocks, sp over image rows) span all their chips --
ICI within a host's slice, DCN across hosts, with XLA placing the
collectives.  Client-side encrypt/decrypt still happens on host 0 (or any
trusted host); ciphertext arrays are distributed via jax.device_put with a
global NamedSharding.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np


def init_distributed(
    coordinator: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
):
    """Initialize jax.distributed from args or the standard env vars
    (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID).
    No-op when single-process."""
    import jax

    coordinator = coordinator or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if coordinator is None:
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=int(num_processes or os.environ.get("JAX_NUM_PROCESSES", 1)),
        process_id=int(process_id or os.environ.get("JAX_PROCESS_ID", 0)),
    )
    return True


def global_block_sharding(mesh_axes=("dp",)):
    """Mesh over all global devices + block-axis sharding, for multi-host
    data-parallel pipelines."""
    import jax
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    devs = np.asarray(jax.devices())
    mesh = Mesh(devs.reshape((len(devs),) if len(mesh_axes) == 1 else None),
                mesh_axes)
    return mesh, NamedSharding(mesh, P(mesh_axes[0]))


def distribute_ciphertexts(cts, sharding):
    """Host numpy ciphertext batch -> globally sharded device array."""
    import jax

    return jax.device_put(cts, sharding)
