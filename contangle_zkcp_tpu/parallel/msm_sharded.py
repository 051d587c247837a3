"""Multi-chip MSM: points sharded over the mesh, per-device Pippenger
bucket phases in parallel, window partial sums combined across devices.

Layout (SURVEY.md §2.3.6 / BASELINE north star): the point/scalar arrays
are sharded along the batch axis ("points"); every device runs the full
windowed bucket accumulation on its shard only — no communication at all
during the O(N) phase.  The cross-device reduction is K window sums per
device (a few hundred EC points), gathered and folded at the end; EC
addition is not a ring reduction XLA knows, so the fold happens on-host
(upgrading this tail to an on-device `ppermute` tree ride over ICI is a
later optimization; it is O(K log D) adds, microseconds of work).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..ops.msm import MSM, digits_from_limbs


class ShardedMSM:
    def __init__(self, msm: MSM, mesh: Mesh, axis: str = "points"):
        self.msm = msm
        self.mesh = mesh
        self.axis = axis
        ndev = mesh.devices.size
        coord_spec = P(axis) if not hasattr(msm.dev.ops, "F") else P(axis)
        pt_specs = {"x": coord_spec, "y": coord_spec, "z": coord_spec}
        self._local = shard_map(
            self._local_phase,
            mesh=mesh,
            in_specs=(pt_specs, P(axis)),
            out_specs={"x": P(axis), "y": P(axis), "z": P(axis)},
        )

    def _local_phase(self, points, scalars):
        digits = digits_from_limbs(scalars, self.msm.c, self.msm.K)
        win = self.msm._bucket_phase_impl(points, digits)
        # add a leading per-device axis of size 1 so the gathered output is
        # (ndev, K, ...) window partials
        return {k: v[None, ...] for k, v in win.items()}

    def run(self, points, scalars):
        """points: device batch sharded along N; scalars: (N, L) limbs.
        Returns the MSM result as a host affine point."""
        dev = self.msm.dev
        if isinstance(points, (list, tuple)):
            points = dev.encode_points(list(points))
        if isinstance(scalars, (list, tuple)):
            import numpy as np

            from ..fields.bigint import LIMB_BITS

            L = -(-self.msm.scalar_bits // LIMB_BITS)
            arr = np.zeros((len(scalars), L), dtype=np.uint32)
            for i, s in enumerate(scalars):
                for j in range(L):
                    arr[i, j] = (s >> (LIMB_BITS * j)) & 0xFFFF
            scalars = jnp.asarray(arr)
        sharding = NamedSharding(self.mesh, P(self.axis))
        points = {k: jax.device_put(v, NamedSharding(self.mesh, P(self.axis, *([None] * (v.ndim - 1))))) for k, v in points.items()}
        scalars = jax.device_put(scalars, NamedSharding(self.mesh, P(self.axis, None)))
        partials = self._local(points, scalars)  # (ndev, K, ...)
        # host fold: combine per-device window sums, then Horner over windows
        ndev = self.mesh.devices.size
        win_pts = []
        for d in range(ndev):
            shard = {k: v[d] for k, v in partials.items()}
            win_pts.append(dev.decode_points(shard))
        K = self.msm.K
        combined = []
        for k in range(K):
            acc = None
            for d in range(ndev):
                acc = dev.host_add(acc, win_pts[d][k])
            combined.append(acc)
        return self.msm._combine_host(combined)
