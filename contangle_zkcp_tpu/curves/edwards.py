"""Batched twisted Edwards group ops on limb planes (device).

Extended coordinates (X, Y, Z, T) with X*Y = Z*T.  For a = -1 curves
(Jubjub) the unified Hisil-Wong-Carter-Dawson formulas are strongly
unified (no special cases for doubling/identity), which is exactly what a
SIMD machine wants: every lane runs the same instruction stream, no
branches.  (TPU-native replacement for arkworks' ark-ec twisted Edwards
backend used by the reference's ElGamal at
/root/reference/circuits-ark/src/encryption.rs:154-217.)

Point batches are pytrees {x, y, z, t} of (..., L) uint32 Montgomery limb
arrays.  All ops are shape-polymorphic over leading axes and jit-friendly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..fields.fp import Fp
from .host import EdwardsCurve


class EdwardsDevice:
    """Batched Jubjub-style (a = -1) twisted Edwards arithmetic."""

    def __init__(self, F: Fp, curve: EdwardsCurve):
        assert curve.a == F.p - 1, "device formulas specialized to a = -1"
        self.F = F
        self.curve = curve
        self.d_m = F.encode(curve.d)
        self.k_m = F.encode(2 * curve.d % F.p)  # 2d for the unified add
        self.gen = self.encode_points([curve.generator])
        self.add = jax.jit(self._add_impl)
        self.double = jax.jit(self._double_impl)
        self.scalar_mul_bits = jax.jit(self._scalar_mul_bits_impl)
        self.to_affine = jax.jit(self._to_affine_impl)

    # ---------------------------------------------------------------- host
    def encode_points(self, pts):
        """[(x, y), ...] affine ints -> extended-coordinate device batch."""
        xs = [p[0] for p in pts]
        ys = [p[1] for p in pts]
        ts = [p[0] * p[1] % self.F.p for p in pts]
        F = self.F
        return {
            "x": jnp.asarray(F.encode(xs)),
            "y": jnp.asarray(F.encode(ys)),
            "z": jnp.asarray(np.broadcast_to(F.one_mont_limbs, (len(pts), F.L)).copy()),
            "t": jnp.asarray(F.encode(ts)),
        }

    def decode_points(self, P):
        """Device batch -> [(x, y), ...] affine ints (via host inversion)."""
        F = self.F
        xs = F.decode(np.asarray(P["x"]).reshape(-1, F.L))
        ys = F.decode(np.asarray(P["y"]).reshape(-1, F.L))
        zs = F.decode(np.asarray(P["z"]).reshape(-1, F.L))
        out = []
        for x, y, z in zip(xs, ys, zs):
            zi = pow(z, -1, F.p)
            out.append((x * zi % F.p, y * zi % F.p))
        return out

    def identity(self, shape=()):
        F = self.F
        zero = F.zeros(shape)
        one = jnp.broadcast_to(jnp.asarray(F.one_mont_limbs), zero.shape)
        return {"x": zero, "y": one, "z": one, "t": zero}

    # -------------------------------------------------------------- device
    def _add_impl(self, P, Q):
        """Unified extended addition, a = -1 (add-2008-hwcd-3): 8M + 1k."""
        F = self.F
        k = jnp.asarray(self.k_m)
        A = F._mul_impl(F._sub_impl(P["y"], P["x"]), F._sub_impl(Q["y"], Q["x"]))
        B = F._mul_impl(F._add_impl(P["y"], P["x"]), F._add_impl(Q["y"], Q["x"]))
        C = F._mul_impl(F._mul_impl(P["t"], k), Q["t"])
        D = F._mul_impl(P["z"], F._add_impl(Q["z"], Q["z"]))
        E = F._sub_impl(B, A)
        Fv = F._sub_impl(D, C)
        G = F._add_impl(D, C)
        H = F._add_impl(B, A)
        return {
            "x": F._mul_impl(E, Fv),
            "y": F._mul_impl(G, H),
            "z": F._mul_impl(Fv, G),
            "t": F._mul_impl(E, H),
        }

    def _double_impl(self, P):
        """Dedicated doubling (dbl-2008-hwcd), a = -1: 4S + 3M."""
        F = self.F
        A = F._mul_impl(P["x"], P["x"])
        B = F._mul_impl(P["y"], P["y"])
        zz = F._mul_impl(P["z"], P["z"])
        C = F._add_impl(zz, zz)
        D = F._neg_impl(A)  # a*A with a = -1
        xy = F._add_impl(P["x"], P["y"])
        E = F._sub_impl(F._sub_impl(F._mul_impl(xy, xy), A), B)
        G = F._add_impl(D, B)
        Fv = F._sub_impl(G, C)
        H = F._sub_impl(D, B)
        return {
            "x": F._mul_impl(E, Fv),
            "y": F._mul_impl(G, H),
            "z": F._mul_impl(Fv, G),
            "t": F._mul_impl(E, H),
        }

    def select(self, cond, P, Q):
        """cond ? P : Q, cond shaped like the batch."""
        F = self.F
        return {c: F.select(cond, P[c], Q[c]) for c in ("x", "y", "z", "t")}

    def _scalar_mul_bits_impl(self, P, bits):
        """Batched double-and-add: bits (..., nbits) uint32 (LSB first).

        LSB-first matches the circuit gadget's `scalar_mul_le` semantics
        (/root/reference/circuits-ark/src/encryption.rs:243-248).
        """
        nbits = bits.shape[-1]
        acc = self.identity(P["x"].shape[:-1])

        def body(i, carry):
            acc, base = carry
            bit = bits[..., i] == 1
            acc = self.select(bit, self._add_impl(acc, base), acc)
            base = self._double_impl(base)
            return (acc, base)

        acc, _ = jax.lax.fori_loop(0, nbits, body, (acc, P))
        return acc

    def scalar_mul_ints(self, P, scalars, nbits=None):
        """Host scalars -> device scalar mul (test/tooling path)."""
        nbits = nbits or (8 * ((self.curve.order.bit_length() + 7) // 8))
        bits = np.zeros((len(scalars), nbits), dtype=np.uint32)
        for j, s in enumerate(scalars):
            for i in range(nbits):
                bits[j, i] = (s >> i) & 1
        return self.scalar_mul_bits(P, jnp.asarray(bits))

    def _to_affine_impl(self, P):
        """(..., L) batched affine coords via batched field inversion."""
        F = self.F
        zinv = F._inv_impl(P["z"])
        return F._mul_impl(P["x"], zinv), F._mul_impl(P["y"], zinv)
