"""Multi-chip NTT: explicit Bailey four-step with ICI all-to-alls.

TPU-native equivalent of the butterfly-stage exchange the north star
names (BASELINE.json; SURVEY.md §2.3.6): the length-n transform is
decomposed as an (n1 x n2) matrix — column NTTs, twiddle scaling, row
NTTs, transpose — with the three global transposes expressed as
`jax.lax.all_to_all` inside `shard_map`, which XLA lowers to the ICI
all-to-all collective.  All local transforms ride the single-chip batched
stage pipeline (ops/ntt.py `forward_batched`), i.e. the Pallas field
kernel on TPU.

Layout walk (D devices, rows sharded):
    in   (n1, n2)   P("x", None)   local (n1/D, n2)
    A2A  split ax1 / concat ax0 -> local (n1, n2/D)     [transpose 1]
    NTT  length-n1 along axis 0 (batched over n2/D columns)
    mul  w_n^{k1*i2} twiddles (sharded along i2)
    A2A  split ax0 / concat ax1 -> local (n1/D, n2)     [transpose 2]
    NTT  length-n2 along axis 1 (batched over n1/D rows)
    A2A  split ax1 / concat ax0, local transpose        [transpose 3]
    out  (n2, n1)   P("x", None) — flattening gives X in natural order.

`ShardedNTT` (GSPMD-delegating wrapper) is kept as the baseline; the
four-step class is the hand-laid-out implementation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..fields import instances as fi
from ..ops.ntt import NTT


class ShardedNTT:
    """GSPMD-auto sharded wrapper of the single-chip stage pipeline."""

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


class FourStepNTT:
    """Explicit distributed four-step NTT over a 1-D device mesh axis."""

    def __init__(self, F, n: int, mesh: Mesh, axis: str = "x", n1: int | None = None):
        assert n & (n - 1) == 0
        self.F = F
        self.n = n
        self.mesh = mesh
        self.axis = axis
        D = int(np.prod([mesh.shape[a] for a in (axis,)]))
        self.D = D
        if n1 is None:
            n1 = 1 << ((n.bit_length() - 1) // 2)
            n1 = max(n1, D)
        n2 = n // n1
        assert n1 % D == 0 and n2 % D == 0, (n1, n2, D)
        self.n1, self.n2 = n1, n2
        self.col = NTT(F, n1)
        self.row = NTT(F, n2)
        w = fi.root_of_unity(F.p, n)
        # twiddle matrix w_n^{k1*i2} (Montgomery), (n1, n2, L); sharded
        # along i2 so each device holds its (n1, n2/D, L) slab
        p = F.p
        col_pows = [pow(w, k1, p) for k1 in range(n1)]
        tw = np.empty((n1, n2), dtype=object)
        # build row-by-row with running products (host, one-time per size)
        for k1 in range(n1):
            base = col_pows[k1]
            acc = 1
            row = tw[k1]
            for i2 in range(n2):
                row[i2] = acc
                acc = acc * base % p
        flat = [int(v) for v in tw.reshape(-1)]
        self._tw = jnp.asarray(F.encode(flat)).reshape(n1, n2, F.L)

        pt = P(axis, None, None)
        self._fwd = jax.jit(
            shard_map(
                self._forward_local,
                mesh=mesh,
                # data sharded along k1-rows; twiddles pre-sharded along i2
                # (their post-transpose layout) so no extra exchange
                in_specs=(pt, P(None, axis, None)),
                out_specs=pt,
            )
        )

    def _forward_local(self, a, tw):
        """a: local (n1/D, n2, L) rows; tw: local (n1, n2/D, L)... see
        in_specs — both sharded along their first global axis; the twiddle
        slab is re-sliced after the first transpose."""
        F, n1, n2, D = self.F, self.n1, self.n2, self.D
        ax = self.axis
        # transpose 1: (n1/D, n2) -> (n1, n2/D)
        a = jax.lax.all_to_all(a, ax, split_axis=1, concat_axis=0, tiled=True)
        # column NTTs: length n1 along axis 0 -> batch over local columns
        a = jnp.swapaxes(a, 0, 1)  # (n2/D, n1, L)
        a = self.col.forward_batched(a)
        # twiddles arrive as the local (n1, n2/D, L) slab already
        twl = jnp.swapaxes(tw, 0, 1)  # (n2/D, n1, L)
        a = F._mul_impl(a.reshape(-1, F.L), twl.reshape(-1, F.L)).reshape(a.shape)
        a = jnp.swapaxes(a, 0, 1)  # (n1, n2/D, L)
        # transpose 2: (n1, n2/D) -> (n1/D, n2)
        a = jax.lax.all_to_all(a, ax, split_axis=0, concat_axis=1, tiled=True)
        # row NTTs: length n2 along axis 1, batched over local rows
        a = self.row.forward_batched(a)
        # transpose 3: (n1/D, n2) -> (n1, n2/D) -> local transpose
        a = jax.lax.all_to_all(a, ax, split_axis=1, concat_axis=0, tiled=True)
        a = jnp.swapaxes(a, 0, 1)  # (n2/D, n1, L): row-shard of (n2, n1)
        return a

    def forward(self, a):
        """a: (n, L) device array (replicated or host) -> (n, L) DFT in
        natural order, computed sharded; output gathered to one array."""
        F, n1, n2 = self.F, self.n1, self.n2
        mat = a.reshape(n1, n2, F.L)
        spec = NamedSharding(self.mesh, P(self.axis, None, None))
        mat = jax.device_put(mat, spec)
        tw = jax.device_put(
            self._tw, NamedSharding(self.mesh, P(None, self.axis, None))
        )
        out = self._fwd(mat, tw)  # (n2, n1, L) row-sharded
        return out.reshape(self.n, F.L)
