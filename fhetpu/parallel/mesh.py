"""Device mesh + sharding helpers (SURVEY.md section 2.3).

The reference has no parallelism (single-threaded SEAL loops); the TPU-native
equivalents are:

* **block data-parallelism**: the batch-of-8x8-blocks axis of ciphertext
  arrays [nb, ..., L, n] shards across chips ("dp" axis); every evaluator op
  is elementwise over that axis so XLA partitions with zero collectives.
* **spatial sharding with halo exchange**: encrypted resize shards image
  rows across chips ("sp" axis) and exchanges boundary ciphertext rows via
  ppermute (see parallel.halo).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(axis_sizes: Optional[dict] = None, devices=None) -> Mesh:
    """Mesh over the given axes; default: all devices on one 'dp' axis."""
    devices = list(devices if devices is not None else jax.devices())
    if not axis_sizes:
        axis_sizes = {"dp": len(devices)}
    names = tuple(axis_sizes.keys())
    sizes = tuple(axis_sizes.values())
    arr = np.asarray(devices).reshape(sizes)
    return Mesh(arr, names)


def block_sharding(mesh: Mesh, axis: str = "dp") -> NamedSharding:
    """Shard the leading (block-batch) axis; replicate the rest."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
