"""Batched short-Weierstrass (a = 0) group ops in Jacobian coordinates.

Generic over the coordinate field: instantiate with an `Fp` (BLS12-381 G1,
BN254 G1, Pasta) or an `Fq2Device` (BLS12-381/BN254 G2) — one group law
for all of them.  Branch-free: the doubling/infinity special cases of the
Jacobian addition law are resolved with lane masks (`select`), so the MSM
bucket accumulators can run millions of lanes in lockstep.  (TPU-native
replacement for arkworks' ark-ec short-Weierstrass projective backend that
Groth16's MSMs run on; SURVEY.md §2.2.)

Point batches are pytrees {x, y, z}; infinity is encoded as z == 0.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


class SWDevice:
    def __init__(self, ops, host_curve=None):
        """ops: Fp or Fq2Device; host_curve: optional host.SWCurve mirror."""
        self.ops = ops
        self.host_curve = host_curve
        self.add = jax.jit(self._add_impl)
        self.double = jax.jit(self._double_impl)
        self.scalar_mul_bits = jax.jit(self._scalar_mul_bits_impl)

    # ---------------------------------------------------------------- host
    def encode_points(self, pts):
        """[(x, y) or None, ...] -> Jacobian device batch (z=1, inf z=0)."""
        ops = self.ops
        zero_c = 0 if not _is_fq2(ops) else (0, 0)
        one_c = 1 if not _is_fq2(ops) else (1, 0)
        xs = [p[0] if p is not None else zero_c for p in pts]
        ys = [p[1] if p is not None else one_c for p in pts]
        zs = [one_c if p is not None else zero_c for p in pts]
        return {
            "x": jnp.asarray(ops.encode(xs)),
            "y": jnp.asarray(ops.encode(ys)),
            "z": jnp.asarray(ops.encode(zs)),
        }

    def decode_points(self, P):
        """Device batch -> [(x, y) or None, ...] affine (host math)."""
        ops = self.ops
        xs = ops.decode(_flat(P["x"], ops))
        ys = ops.decode(_flat(P["y"], ops))
        zs = ops.decode(_flat(P["z"], ops))
        out = []
        for x, y, z in zip(xs, ys, zs):
            if _h_is_zero(z):
                out.append(None)
                continue
            zi = _h_inv(z, ops)
            zi2 = _h_mul(zi, zi, ops)
            zi3 = _h_mul(zi2, zi, ops)
            out.append((_h_mul(x, zi2, ops), _h_mul(y, zi3, ops)))
        return out

    def identity(self, shape=()):
        ops = self.ops
        zero = ops.zeros(shape)
        one = ops.one_mont(shape)
        return {"x": one, "y": one, "z": zero}

    def is_infinity(self, P):
        return self.ops.is_zero(P["z"])

    def select(self, cond, P, Q):
        ops = self.ops
        return {c: ops.select(cond, P[c], Q[c]) for c in ("x", "y", "z")}

    # -------------------------------------------------------------- device
    def _double_impl(self, P):
        """dbl-2009-l (a = 0): 2M + 5S."""
        o = self.ops
        X, Y, Z = P["x"], P["y"], P["z"]
        A = o.square(X)
        B = o.square(Y)
        C = o.square(B)
        t = o.square(o.add(X, B))
        D = o.sub(o.sub(t, A), C)
        D = o.add(D, D)
        E = o.add(o.add(A, A), A)
        F = o.square(E)
        X3 = o.sub(F, o.add(D, D))
        C8 = _dbl_n(o, C, 3)  # 8C
        Y3 = o.sub(o.mul(E, o.sub(D, X3)), C8)
        Z3 = o.mul(o.add(Y, Y), Z)
        return {"x": X3, "y": Y3, "z": Z3}

    def _add_impl(self, P, Q):
        """add-2007-bl with mask-resolved special cases."""
        o = self.ops
        X1, Y1, Z1 = P["x"], P["y"], P["z"]
        X2, Y2, Z2 = Q["x"], Q["y"], Q["z"]
        Z1Z1 = o.square(Z1)
        Z2Z2 = o.square(Z2)
        U1 = o.mul(X1, Z2Z2)
        U2 = o.mul(X2, Z1Z1)
        S1 = o.mul(o.mul(Y1, Z2), Z2Z2)
        S2 = o.mul(o.mul(Y2, Z1), Z1Z1)
        H = o.sub(U2, U1)
        r = o.sub(S2, S1)
        HH = o.square(H)
        HHH = o.mul(H, HH)
        V = o.mul(U1, HH)
        X3 = o.sub(o.sub(o.square(r), HHH), o.add(V, V))
        Y3 = o.sub(o.mul(r, o.sub(V, X3)), o.mul(S1, HHH))
        Z3 = o.mul(o.mul(Z1, Z2), H)
        out = {"x": X3, "y": Y3, "z": Z3}
        # special cases
        h_zero = o.is_zero(H)
        r_zero = o.is_zero(r)
        p_inf = o.is_zero(Z1)
        q_inf = o.is_zero(Z2)
        dbl = self._double_impl(P)
        same = jnp.logical_and(h_zero, r_zero)
        out = self.select(same, dbl, out)
        opp = jnp.logical_and(h_zero, jnp.logical_not(r_zero))
        opp = jnp.logical_and(opp, jnp.logical_not(jnp.logical_or(p_inf, q_inf)))
        inf = self.identity(_batch_shape(Z1, o))
        out = self.select(opp, inf, out)
        out = self.select(p_inf, Q, out)
        out = self.select(q_inf, P, out)
        return out

    def _scalar_mul_bits_impl(self, P, bits):
        """Batched double-and-add; bits (..., nbits) uint32, LSB first."""
        nbits = bits.shape[-1]
        acc = self.identity(_batch_shape(P["z"], self.ops))

        def body(i, carry):
            acc, base = carry
            bit = bits[..., i] == 1
            acc = self.select(bit, self._add_impl(acc, base), acc)
            base = self._double_impl(base)
            return (acc, base)

        acc, _ = jax.lax.fori_loop(0, nbits, body, (acc, P))
        return acc

    def scalar_mul_ints(self, P, scalars, nbits: int):
        bits = np.zeros((len(scalars), nbits), dtype=np.uint32)
        for j, s in enumerate(scalars):
            for i in range(nbits):
                bits[j, i] = (s >> i) & 1
        return self.scalar_mul_bits(P, jnp.asarray(bits))


# --------------------------------------------------------------- helpers
def _is_fq2(ops):
    return hasattr(ops, "F")


def _dbl_n(o, x, n):
    for _ in range(n):
        x = o.add(x, x)
    return x


def _flat(arr, ops):
    arr = np.asarray(arr)
    if _is_fq2(ops):
        return arr.reshape(-1, 2, arr.shape[-1])
    return arr.reshape(-1, arr.shape[-1])


def _batch_shape(coord, ops):
    return coord.shape[:-2] if _is_fq2(ops) else coord.shape[:-1]


def _h_is_zero(z):
    return z == 0 or z == (0, 0)


def _h_mul(a, b, ops):
    if _is_fq2(ops):
        from . import fq2

        return fq2.mul(a, b, ops.p)
    return a * b % ops.p


def _h_inv(a, ops):
    if _is_fq2(ops):
        from . import fq2

        return fq2.inv(a, ops.p)
    return pow(a, -1, ops.p)
