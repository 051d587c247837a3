"""Device mesh helpers for multi-chip/multi-host execution.

The framework's parallel axes (SURVEY.md §2.3, the reference's rayon
data-parallelism re-thought for a TPU pod):
  * "points": MSM point/scalar sharding (data-parallel analog);
  * NTT coefficient sharding with XLA-inserted collectives for the
    butterfly-stage exchanges (sequence-parallel analog);
  * per-block Poseidon/ElGamal batches shard trivially along the block axis.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int = None, axis: str = "points") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    import numpy as np

    return Mesh(np.array(devs), (axis,))


def shard_along(mesh: Mesh, axis: str = "points"):
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh):
    return NamedSharding(mesh, P())
