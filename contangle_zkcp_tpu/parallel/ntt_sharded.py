"""Multi-chip NTT: coefficients sharded over the mesh.

The radix-2 stage structure is data-oblivious, so the single-chip stage
pipeline is wrapped in `jit` with sharded input/output: GSPMD partitions
the elementwise butterfly arithmetic along the coefficient axis and
inserts the inter-chip exchanges (all-to-all/collective-permute) for the
stages whose butterfly span crosses shards — exactly the "butterfly-stage
all-to-all over ICI" layout of the north star (BASELINE.json).  An
explicit four-step (local NTTs + transpose) pallas pipeline is the later
hand-tuned upgrade; this version gives a correct sharded baseline whose
collectives XLA already schedules on ICI.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.ntt import NTT


class ShardedNTT:
    def __init__(self, ntt: NTT, mesh: Mesh, axis: str = "points"):
        self.ntt = ntt
        self.mesh = mesh
        self.axis = axis
        spec = NamedSharding(mesh, P(axis, None))
        self.forward = jax.jit(
            ntt._forward_impl, in_shardings=spec, out_shardings=spec
        )
        self.inverse = jax.jit(
            ntt._inverse_impl, in_shardings=spec, out_shardings=spec
        )

    def shard(self, a):
        return jax.device_put(a, NamedSharding(self.mesh, P(self.axis, None)))
