"""Multi-chip MSM: points sharded over the mesh, per-device Pippenger
bucket phases in parallel, window partials all-reduced ON DEVICE.

Layout (SURVEY.md §2.3.6 / BASELINE north star): the point/scalar arrays
are sharded along the batch axis ("points"); every device runs the full
windowed bucket accumulation on its shard only — zero communication in
the O(N) phase.  The cross-device combine is the EC-group analog of
`psum`: a log2(D)-step XOR-butterfly all-reduce built from
`jax.lax.ppermute` (the ICI collective-permute) + one batched complete
EC add per step — K window points per device, so the exchanged payload
is a few tens of KB and the reduction rides ICI, not the host (the
round-1 version decoded every device's partials and folded in Python).
"""

from __future__ import annotations

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
        self.ndev = int(mesh.shape[axis])
        assert self.ndev & (self.ndev - 1) == 0, "device count must be 2^k"
        pt_spec = {"x": P(axis), "y": P(axis), "z": P(axis)}
        self._local = jax.jit(
            shard_map(
                self._local_phase,
                mesh=mesh,
                in_specs=(pt_spec, P(axis)),
                out_specs={"x": P(axis), "y": P(axis), "z": P(axis)},
            )
        )
        # host-scheduled variant: the bucket schedule (per-shard counting
        # sort) is computed on host — sharding the SCHEDULE, not just the
        # points — so the per-device program skips the O(N log^2 N)
        # bitonic argsort that dominated the round-4 scaling numbers
        # (bench_scaling_r4.log, VERDICT r4 weak#5/#6).
        self._local_sched = jax.jit(
            shard_map(
                self._local_phase_scheduled,
                mesh=mesh,
                in_specs=(
                    pt_spec,
                    P(axis, None, None),
                    P(axis, None, None),
                    P(axis, None, None),
                    P(axis, None, None),
                ),
                out_specs={"x": P(axis), "y": P(axis), "z": P(axis)},
            )
        )

    def _local_phase(self, points, scalars):
        dev = self.msm.dev
        digits = digits_from_limbs(scalars, self.msm.c, self.msm.K)
        win = self.msm._bucket_phase_impl(points, digits)  # (K,) points
        # EC all-reduce over the device axis: XOR-butterfly of ppermutes.
        # After log2(D) rounds every device holds the global window sums.
        D, ax = self.ndev, self.axis
        step = 1
        while step < D:
            perm = [(i, i ^ step) for i in range(D)]
            other = {
                k: jax.lax.ppermute(v, ax, perm) for k, v in win.items()
            }
            win = dev.add(win, other)
            step *= 2
        # device 0's copy is returned; leading size-1 axis reassembles to
        # (D, K, ...) with identical rows
        return {k: v[None, ...] for k, v in win.items()}

    def _local_phase_scheduled(self, points, order, start, cnt, sgn):
        """Per-device bucket phase from a host-computed schedule.

        order/start/cnt/sgn arrive with a leading size-1 device axis
        (the shard of the (D, ...) stacked schedule); sgn is all-zero
        in unsigned mode."""
        dev = self.msm.dev
        order, start, cnt = order[0], start[0], cnt[0]
        sgn = sgn[0]
        if self.msm.signed:
            win = self.msm._bucket_loop(
                points, order, start, cnt, order.shape[1], sgn=sgn
            )
        else:
            win = self.msm._bucket_loop(
                points, order, start, cnt, order.shape[1]
            )
        D, ax = self.ndev, self.axis
        step = 1
        while step < D:
            perm = [(i, i ^ step) for i in range(D)]
            other = {
                k: jax.lax.ppermute(v, ax, perm) for k, v in win.items()
            }
            win = dev.add(win, other)
            step *= 2
        return {k: v[None, ...] for k, v in win.items()}

    def run_scheduled(self, points, scalars):
        """Host-scheduled sharded MSM: numpy/native counting-sort per
        shard, one compiled shard_map program for the bucket phase +
        EC all-reduce.  `scalars` may be host limbs or device limbs."""
        import numpy as np

        dev = self.msm.dev
        if isinstance(points, (list, tuple)):
            points = dev.encode_points(list(points))
        if isinstance(scalars, (list, tuple)):
            from ..fields.bigint import LIMB_BITS, ints_to_limbs

            L = -(-self.msm.scalar_bits // LIMB_BITS)
            scalars = jnp.asarray(ints_to_limbs(scalars, L))
        limbs = np.asarray(jax.device_get(scalars))
        N = limbs.shape[0]
        D = self.ndev
        assert N % D == 0, "N must divide the mesh"
        Nd = N // D
        orders, starts, cnts, sgns = [], [], [], []
        for d in range(D):
            sl = limbs[d * Nd : (d + 1) * Nd]
            if self.msm.signed:
                o, s0, c0, g = self.msm.host_schedule_signed(sl)
            else:
                o, s0, c0 = self.msm.host_schedule(sl)
                g = np.zeros_like(o, dtype=np.int8)
            orders.append(o)
            starts.append(s0)
            cnts.append(c0)
            sgns.append(g)
        order = jnp.asarray(np.stack(orders))
        start = jnp.asarray(np.stack(starts))
        cnt = jnp.asarray(np.stack(cnts))
        sgn = jnp.asarray(np.stack(sgns).astype(np.int8))
        points = {
            k: jax.device_put(
                v,
                NamedSharding(self.mesh, P(self.axis, *([None] * (v.ndim - 1)))),
            )
            for k, v in points.items()
        }
        sh3 = NamedSharding(self.mesh, P(self.axis, None, None))
        order, start, cnt, sgn = (
            jax.device_put(order, sh3),
            jax.device_put(start, sh3),
            jax.device_put(cnt, sh3),
            jax.device_put(sgn, sh3),
        )
        partials = self._local_sched(points, order, start, cnt, sgn)
        win_pts = dev.decode_points({k: v[0] for k, v in partials.items()})
        return self.msm._combine_host(win_pts)

    def run(self, points, scalars):
        """points: device batch sharded along N; scalars: (N, L) limbs.
        Returns the MSM result as a host affine point."""
        dev = self.msm.dev
        if isinstance(points, (list, tuple)):
            points = dev.encode_points(list(points))
        if isinstance(scalars, (list, tuple)):
            from ..fields.bigint import LIMB_BITS, ints_to_limbs

            L = -(-self.msm.scalar_bits // LIMB_BITS)
            scalars = jnp.asarray(ints_to_limbs(scalars, L))
        points = {
            k: jax.device_put(
                v,
                NamedSharding(self.mesh, P(self.axis, *([None] * (v.ndim - 1)))),
            )
            for k, v in points.items()
        }
        scalars = jax.device_put(
            scalars, NamedSharding(self.mesh, P(self.axis, None))
        )
        partials = self._local(points, scalars)  # (D, K, ...), rows equal
        win_pts = dev.decode_points({k: v[0] for k, v in partials.items()})
        return self.msm._combine_host(win_pts)
