"""Batched short-Weierstrass (a = 0) group ops, complete projective form.

Generic over the coordinate field: instantiate with an `Fp` (BLS12-381 G1,
BN254 G1, Pasta) or an `Fq2Device` (BLS12-381/BN254 G2) — one group law
for all of them.  (TPU-native replacement for arkworks' ark-ec
short-Weierstrass projective backend that Groth16's MSMs run on;
SURVEY.md §2.2.)

The group law is the Renes–Costello–Batina (2015) *complete* addition for
a = 0 (their Algorithm 7): a single 12-multiplication straight-line formula
valid for every input pair — identity (0:1:0), doubling, inverses included.
That completeness is the whole point on a TPU: the MSM bucket loop and the
scalar-mul ladder run one branch-free instruction stream across millions
of lanes, with no masks, no per-case doubling path, and a compile graph a
third the size of a masked Jacobian law.

Point batches are pytrees {x, y, z} of projective coordinates; infinity is
(0 : 1 : 0), i.e. z == 0.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


class SWDevice:
    def __init__(self, ops, host_curve=None, b=None, b2=None):
        """ops: Fp or Fq2Device; host_curve: optional host.SWCurve mirror;
        b: curve constant (int for Fp; (c0, c1) for Fq2; defaults from
        host_curve when given)."""
        self.ops = ops
        self.host_curve = host_curve
        if b is None and host_curve is not None:
            b = host_curve.b
        if b is None and b2 is not None:
            b = b2
        assert b is not None, "curve constant b required"
        self.b = b
        if _is_fq2(ops):
            p = ops.p
            b3 = ((3 * b[0]) % p, (3 * b[1]) % p)
        else:
            b3 = 3 * b % ops.p
        self._b3 = np.asarray(ops.encode(b3))
        self.add = jax.jit(self._add_impl)
        self.double = jax.jit(self._double_impl)
        self.scalar_mul_bits = jax.jit(self._scalar_mul_bits_impl)

    # ---------------------------------------------------------------- host
    def encode_points(self, pts):
        """[(x, y) or None, ...] -> projective device batch (z=1; inf (0,1,0))."""
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
            out.append((_h_mul(x, zi, ops), _h_mul(y, zi, ops)))
        return out

    def identity(self, shape=()):
        ops = self.ops
        zero = ops.zeros(shape)
        one = ops.one_mont(shape)
        return {"x": zero, "y": one, "z": zero}

    def is_infinity(self, P):
        return self.ops.is_zero(P["z"])

    def select(self, cond, P, Q):
        ops = self.ops
        return {c: ops.select(cond, P[c], Q[c]) for c in ("x", "y", "z")}

    def host_add(self, P, Q):
        """Exact host affine addition (field-generic; a = 0)."""
        if P is None:
            return Q
        if Q is None:
            return P
        o = self.ops
        x1, y1 = P
        x2, y2 = Q
        if x1 == x2:
            if _h_is_zero(_h_add(y1, y2, o)):
                return None
            num = _h_smul(_h_mul(x1, x1, o), 3, o)
            den = _h_smul(y1, 2, o)
        else:
            num = _h_sub(y2, y1, o)
            den = _h_sub(x2, x1, o)
        lam = _h_mul(num, _h_inv(den, o), o)
        x3 = _h_sub(_h_sub(_h_mul(lam, lam, o), x1, o), x2, o)
        y3 = _h_sub(_h_mul(lam, _h_sub(x1, x3, o), o), y1, o)
        return (x3, y3)

    def host_mul(self, k: int, P):
        R = None
        Q = P
        while k > 0:
            if k & 1:
                R = self.host_add(R, Q)
            Q = self.host_add(Q, Q)
            k >>= 1
        return R

    # -------------------------------------------------------------- device
    def _mul_many(self, pairs):
        """Stack independent field multiplies into one batched multiply —
        bigger matmul tiles for the MXU, ~6x fewer dispatches per add."""
        o = self.ops
        A = jnp.stack([a for a, _ in pairs])
        B = jnp.stack([b for _, b in pairs])
        C = o.mul(A, B)
        return [C[i] for i in range(len(pairs))]

    def _add_impl(self, P, Q):
        """Renes-Costello-Batina complete addition, a = 0 (Algorithm 7),
        restructured into 3 rounds of stacked independent multiplies.

        On TPU with large batches the whole formula runs as ONE fused
        Pallas kernel (ops/pallas_curve.py) — 12 in-VMEM Montgomery
        multiplies, one HBM round-trip — for prime-field groups (G1);
        Fq2 groups (G2) and small/CPU batches keep the XLA path below.
        """
        o = self.ops
        if not _is_fq2(o):
            from ..fields.fp import PALLAS_MIN_BATCH, _use_pallas

            batch = P["x"].shape[:-1]
            n = 1
            for d in batch:
                n *= int(d)
            if n >= PALLAS_MIN_BATCH and _use_pallas():
                from ..ops import pallas_curve

                eng = pallas_curve.get_engine(o, tuple(int(v) for v in self._b3))
                return eng.add(P, Q)
        X1, Y1, Z1 = P["x"], P["y"], P["z"]
        X2, Y2, Z2 = Q["x"], Q["y"], Q["z"]
        b3 = jnp.broadcast_to(jnp.asarray(self._b3), X1.shape)
        t0, t1, t2, u1, u2, u3 = self._mul_many(
            [
                (X1, X2),
                (Y1, Y2),
                (Z1, Z2),
                (o.add(X1, Y1), o.add(X2, Y2)),
                (o.add(Y1, Z1), o.add(Y2, Z2)),
                (o.add(X1, Z1), o.add(X2, Z2)),
            ]
        )
        t3 = o.sub(u1, o.add(t0, t1))  # X1Y2 + X2Y1
        t4 = o.sub(u2, o.add(t1, t2))  # Y1Z2 + Y2Z1
        y3p = o.sub(u3, o.add(t0, t2))  # X1Z2 + X2Z1
        t2b, y3b = self._mul_many([(b3, t2), (b3, y3p)])
        Z3p = o.add(t1, t2b)
        t1p = o.sub(t1, t2b)
        t0p = o.add(o.add(t0, t0), t0)  # 3*X1X2
        m1, m2, m3, m4, m5, m6 = self._mul_many(
            [
                (t4, y3b),
                (t3, t1p),
                (y3b, t0p),
                (t1p, Z3p),
                (t0p, t3),
                (Z3p, t4),
            ]
        )
        return {
            "x": o.sub(m2, m1),
            "y": o.add(m4, m3),
            "z": o.add(m6, m5),
        }

    def _double_impl(self, P):
        # the complete add doubles correctly; a dedicated 6M+2S doubling is
        # a later micro-optimization
        return self._add_impl(P, P)

    def _scalar_mul_bits_impl(self, P, bits):
        """Batched double-and-add; bits (..., nbits) uint32, LSB first."""
        nbits = bits.shape[-1]
        acc = self.identity(_batch_shape(P["z"], self.ops))

        def body(i, carry):
            acc, base = carry
            bit = bits[..., i] == 1
            acc = self.select(bit, self._add_impl(acc, base), acc)
            base = self._add_impl(base, base)
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


def _h_add(a, b, ops):
    if _is_fq2(ops):
        from . import fq2

        return fq2.add(a, b, ops.p)
    return (a + b) % ops.p


def _h_sub(a, b, ops):
    if _is_fq2(ops):
        from . import fq2

        return fq2.sub(a, b, ops.p)
    return (a - b) % ops.p


def _h_smul(a, k: int, ops):
    if _is_fq2(ops):
        from . import fq2

        return fq2.scalar_mul(a, k, ops.p)
    return a * k % ops.p


def _h_inv(a, ops):
    if _is_fq2(ops):
        from . import fq2

        return fq2.inv(a, ops.p)
    return pow(a, -1, ops.p)
