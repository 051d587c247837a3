"""Mesh-pipelined Nova folding of PoE proof streams (BASELINE config #5).

The reference documents an `EncryptionAggregatorCircuit` that
"recursively aggregates an arbitrary number of proofs"
(/root/reference/docs/protocol.md:57) but never builds it; the
TPU-native accumulation primitive is `groth16.folding.FoldingScheme`.
This module supplies its distributed execution shape: a TREE fold of k
accumulated instances where each level's dominant device work — the
cross-term Pedersen commitments comm_T = MSM(bases_E, T) — runs as ONE
sharded multi-vector MSM over the device mesh:

  * the base points are sharded along the mesh's "points" axis and live
    there for the whole stream (loaded once, reused every level);
  * per device, the Pippenger bucket phase is vmapped over the level's
    m cross-term vectors — zero communication in the O(N) phase;
  * one XOR-butterfly `ppermute` EC all-reduce combines window partials
    for all m vectors at once (payload m*K points per step).

The Fiat-Shamir transcript is bit-identical to the sequential
FoldingScheme.fold (fold_with_comm shares the combine step), so host
and mesh pipelines produce the same accumulator.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..curves import instances as ci
from ..curves.weierstrass import SWDevice
from ..fields import instances as fi
from ..fields.bigint import LIMB_BITS, ints_to_limbs
from ..ops.msm import MSM, digits_from_limbs


class MeshFoldPipeline:
    def __init__(self, scheme, mesh: Mesh, axis: str = "points", c: int = 8):
        self.scheme = scheme
        self.mesh = mesh
        self.axis = axis
        self.ndev = int(mesh.shape[axis])
        assert self.ndev & (self.ndev - 1) == 0, "device count must be 2^k"
        self.dev = SWDevice(fi.bls12_381_fq(), ci.BLS12_381_G1)
        self.msm = MSM(self.dev, scalar_bits=255, c=c)
        self.L = -(-255 // LIMB_BITS)
        # bases_E padded with the identity to a device multiple (zero
        # scalars are added for pad slots — no contribution)
        nb = len(scheme.bases_e)
        npad = -(-nb // self.ndev) * self.ndev
        pts = self.dev.encode_points(
            list(scheme.bases_e) + [None] * (npad - nb)
        )
        self.n_pts = npad
        self._pts = {
            k: jax.device_put(
                v,
                NamedSharding(mesh, P(axis, *([None] * (v.ndim - 1)))),
            )
            for k, v in pts.items()
        }
        self._commit_many_jit = jax.jit(
            shard_map(
                self._local_phase,
                mesh=mesh,
                in_specs=(
                    {"x": P(axis), "y": P(axis), "z": P(axis)},
                    P(None, axis, None),
                ),
                out_specs={
                    "x": P(axis),
                    "y": P(axis),
                    "z": P(axis),
                },
            )
        )

    def _local_phase(self, points, scalars):
        """scalars: (m, N_local, L).  Per-device bucket phases vmapped
        over the m vectors, then one butterfly EC all-reduce for all m."""
        dev, msm = self.dev, self.msm

        def one(s):
            digits = digits_from_limbs(s, msm.c, msm.K)
            return msm._bucket_phase_impl(points, digits)

        win = jax.vmap(one)(scalars)  # {coord: (m, K, ...)}
        D, ax = self.ndev, self.axis
        step = 1
        while step < D:
            perm = [(i, i ^ step) for i in range(D)]
            other = {k: jax.lax.ppermute(v, ax, perm) for k, v in win.items()}
            win = dev.add(win, other)
            step *= 2
        return {k: v[None, ...] for k, v in win.items()}

    def commit_many(self, vecs):
        """[m vectors of field ints] -> [m host affine commitment points].
        Each vector is padded with zeros to the sharded base length."""
        m = len(vecs)
        p = self.scheme.p
        arr = np.zeros((m, self.n_pts, self.L), dtype=np.uint32)
        for j, v in enumerate(vecs):
            arr[j, : len(v)] = ints_to_limbs([x % p for x in v], self.L)
        out = self._commit_many_jit(self._pts, jnp.asarray(arr))
        # rows along the device axis are identical post-all-reduce
        first = {k: v[0] for k, v in out.items()}  # (m, K, ...)
        res = []
        for j in range(m):
            wpts = self.dev.decode_points({k: v[j] for k, v in first.items()})
            res.append(self.msm._combine_host(wpts))
        return res

    def fold_stream(self, lifted):
        """Tree-fold k lifted (instance, witness) pairs into one
        accumulator; each level's cross-term commitments run as one
        sharded multi-vector MSM."""
        sch = self.scheme
        level = list(lifted)
        while len(level) > 1:
            pairs = [
                (level[i], level[i + 1]) for i in range(0, len(level) - 1, 2)
            ]
            carry = level[len(pairs) * 2 :]
            Ts = [
                sch.cross_term(i1, w1, i2, w2)
                for (i1, w1), (i2, w2) in pairs
            ]
            comms = self.commit_many(Ts)
            level = [
                sch.fold_with_comm(i1, w1, i2, w2, T, comm)
                for ((i1, w1), (i2, w2)), T, comm in zip(pairs, Ts, comms)
            ] + carry
        return level[0]
