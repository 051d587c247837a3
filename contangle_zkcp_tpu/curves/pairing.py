"""Host-side pairings for BLS12-381 and BN254 (exact Python ints).

Groth16 verification is 3 pairings + a tiny MSM — not a throughput path
(the prover never computes pairings), so a correct host implementation is
the right cost/benefit; the bulk math stays on TPU.  (Replaces the
reference's ark-ec pairing engines; used by `Groth16::verify` at
/root/reference/lib/src/zk/encryption.rs:135-154.)

Tower: Fq2 = Fq[u]/(u^2+1), Fq6 = Fq2[v]/(v^3 - xi), Fq12 = Fq6[w]/(w^2 - v)
  BLS12-381: xi = u + 1;  BN254: xi = u + 9.

Correctness-first choices (documented, revisit for speed):
  * Miller loop runs with G2 untwisted into E(Fq12) via psi(x,y) =
    (x/w^2, y/w^3) and generic affine line functions — no sparse-element
    slot bookkeeping to get subtly wrong;
  * final exponentiation is a single generic pow by (p^12-1)/r.
Both are cross-checked by bilinearity tests.
"""

from __future__ import annotations

from functools import lru_cache

from ..fields import instances as fi
from . import fq2 as f2
from . import instances as ci

# ----------------------------------------------------------- Fq6 / Fq12 ops
# Fq6 element: (c0, c1, c2) of Fq2; Fq12: (d0, d1) of Fq6.


def _fq6_add(a, b, p):
    return tuple(f2.add(x, y, p) for x, y in zip(a, b))


def _fq6_sub(a, b, p):
    return tuple(f2.sub(x, y, p) for x, y in zip(a, b))


def _fq6_neg(a, p):
    return tuple(f2.neg(x, p) for x in a)


def _mul_by_xi(a, xi, p):
    return f2.mul(a, xi, p)


def _fq6_mul(a, b, xi, p):
    a0, a1, a2 = a
    b0, b1, b2 = b
    v0 = f2.mul(a0, b0, p)
    v1 = f2.mul(a1, b1, p)
    v2 = f2.mul(a2, b2, p)
    c0 = f2.add(v0, _mul_by_xi(f2.sub(f2.mul(f2.add(a1, a2, p), f2.add(b1, b2, p), p), f2.add(v1, v2, p), p), xi, p), p)
    c1 = f2.add(f2.sub(f2.mul(f2.add(a0, a1, p), f2.add(b0, b1, p), p), f2.add(v0, v1, p), p), _mul_by_xi(v2, xi, p), p)
    c2 = f2.add(f2.sub(f2.mul(f2.add(a0, a2, p), f2.add(b0, b2, p), p), f2.add(v0, v2, p), p), v1, p)
    return (c0, c1, c2)


def _fq6_inv(a, xi, p):
    a0, a1, a2 = a
    t0 = f2.square(a0, p)
    t1 = f2.square(a1, p)
    t2 = f2.square(a2, p)
    t3 = f2.mul(a0, a1, p)
    t4 = f2.mul(a0, a2, p)
    t5 = f2.mul(a1, a2, p)
    c0 = f2.sub(t0, _mul_by_xi(t5, xi, p), p)
    c1 = f2.sub(_mul_by_xi(t2, xi, p), t3, p)
    c2 = f2.sub(t1, t4, p)
    t6 = f2.add(f2.mul(a0, c0, p), _mul_by_xi(f2.add(f2.mul(a2, c1, p), f2.mul(a1, c2, p), p), xi, p), p)
    t6i = f2.inv(t6, p)
    return (f2.mul(c0, t6i, p), f2.mul(c1, t6i, p), f2.mul(c2, t6i, p))


_FQ2_ZERO = (0, 0)
_FQ2_ONE = (1, 0)
_FQ6_ZERO = (_FQ2_ZERO, _FQ2_ZERO, _FQ2_ZERO)
_FQ6_ONE = (_FQ2_ONE, _FQ2_ZERO, _FQ2_ZERO)
FQ12_ONE = (_FQ6_ONE, _FQ6_ZERO)
FQ12_ZERO = (_FQ6_ZERO, _FQ6_ZERO)


class Fq12:
    """Fq12 arithmetic context for a given (p, xi)."""

    def __init__(self, p, xi):
        self.p = p
        self.xi = xi

    def add(self, a, b):
        return (_fq6_add(a[0], b[0], self.p), _fq6_add(a[1], b[1], self.p))

    def sub(self, a, b):
        return (_fq6_sub(a[0], b[0], self.p), _fq6_sub(a[1], b[1], self.p))

    def neg(self, a):
        return (_fq6_neg(a[0], self.p), _fq6_neg(a[1], self.p))

    def mul(self, a, b):
        p, xi = self.p, self.xi
        v0 = _fq6_mul(a[0], b[0], xi, p)
        v1 = _fq6_mul(a[1], b[1], xi, p)
        # (a0+a1)(b0+b1) - v0 - v1
        c1 = _fq6_sub(
            _fq6_mul(_fq6_add(a[0], a[1], p), _fq6_add(b[0], b[1], p), xi, p),
            _fq6_add(v0, v1, p),
            p,
        )
        # c0 = v0 + v*v1  (w^2 = v shifts Fq6 coefficients with xi wrap)
        shifted = (_mul_by_xi(v1[2], xi, p), v1[0], v1[1])
        c0 = _fq6_add(v0, shifted, p)
        return (c0, c1)

    def square(self, a):
        return self.mul(a, a)

    def inv(self, a):
        p, xi = self.p, self.xi
        a0, a1 = a
        t0 = _fq6_mul(a0, a0, xi, p)
        t1 = _fq6_mul(a1, a1, xi, p)
        shifted = (_mul_by_xi(t1[2], xi, p), t1[0], t1[1])
        t = _fq6_sub(t0, shifted, p)
        tinv = _fq6_inv(t, xi, p)
        return (_fq6_mul(a0, tinv, xi, p), _fq6_neg(_fq6_mul(a1, tinv, xi, p), p))

    def pow(self, a, e: int):
        r = FQ12_ONE
        base = a
        while e > 0:
            if e & 1:
                r = self.mul(r, base)
            base = self.square(base)
            e >>= 1
        return r

    def conjugate(self, a):
        return (a[0], _fq6_neg(a[1], self.p))

    # embed Fq / Fq2 scalars
    def from_fq(self, x):
        return (((x % self.p, 0), _FQ2_ZERO, _FQ2_ZERO), _FQ6_ZERO)

    def from_fq2(self, c):
        return ((c, _FQ2_ZERO, _FQ2_ZERO), _FQ6_ZERO)

    # w (the Fq12 generator): (0, 1) in Fq6 coords
    W = (_FQ6_ZERO, _FQ6_ONE)


# ---------------------------------------------------------------- pairing
class PairingEngine:
    """Ate-style pairing via generic Miller loop over E(Fq12)."""

    def __init__(self, p, r, xi, loop_count, loop_is_negative, twist="M"):
        self.p = p
        self.r = r
        self.F = Fq12(p, xi)
        self.loop_count = loop_count
        self.loop_neg = loop_is_negative
        self.twist = twist  # "M": E' has b*xi (untwist divides by w^i);
        #                     "D": E' has b/xi (untwist multiplies by w^i)
        self.final_power = (p**12 - 1) // r

    # -------------------------------------------------- E(Fq12) arithmetic
    def _ec_add(self, P, Q):
        F = self.F
        if P is None:
            return Q
        if Q is None:
            return P
        x1, y1 = P
        x2, y2 = Q
        if x1 == x2:
            if F.add(y1, y2) == FQ12_ZERO:
                return None
            num = F.mul(F.from_fq(3), F.square(x1))
            den = F.add(y1, y1)
        else:
            num = F.sub(y2, y1)
            den = F.sub(x2, x1)
        lam = F.mul(num, F.inv(den))
        x3 = F.sub(F.sub(F.square(lam), x1), x2)
        y3 = F.sub(F.mul(lam, F.sub(x1, x3)), y1)
        return (x3, y3)

    def _line(self, T, Q, P):
        """Evaluate the line through T, Q (tangent if T == Q) at P."""
        F = self.F
        x1, y1 = T
        xp, yp = P
        if T == Q:
            num = F.mul(F.from_fq(3), F.square(x1))
            den = F.add(y1, y1)
        else:
            x2, y2 = Q
            if x1 == x2:
                # vertical line x - x1
                return F.sub(xp, x1)
            num = F.sub(Q[1], y1)
            den = F.sub(Q[0], x1)
        lam = F.mul(num, F.inv(den))
        return F.sub(F.sub(yp, y1), F.mul(lam, F.sub(xp, x1)))

    def untwist(self, Q):
        """G2 (Fq2 coords on the twist) -> point on E(Fq12)."""
        F = self.F
        w2 = F.square(F.W)
        w3 = F.mul(w2, F.W)
        if self.twist == "M":
            w2, w3 = F.inv(w2), F.inv(w3)
        x = F.mul(F.from_fq2(Q[0]), w2)
        y = F.mul(F.from_fq2(Q[1]), w3)
        return (x, y)

    def embed_g1(self, P):
        F = self.F
        return (F.from_fq(P[0]), F.from_fq(P[1]))

    def miller_loop(self, P, Q):
        """P: G1 affine (ints); Q: G2 affine (Fq2 tuples). Returns Fq12."""
        if P is None or Q is None:
            return FQ12_ONE
        F = self.F
        Pe = self.embed_g1(P)
        Qe = self.untwist(Q)
        T = Qe
        f = FQ12_ONE
        bits = bin(self.loop_count)[3:]  # skip MSB
        for b in bits:
            f = F.mul(F.square(f), self._line(T, T, Pe))
            T = self._ec_add(T, T)
            if b == "1":
                f = F.mul(f, self._line(T, Qe, Pe))
                T = self._ec_add(T, Qe)
        if self.loop_neg:
            f = F.inv(f)
        return f

    def final_exponentiation(self, f):
        return self.F.pow(f, self.final_power)

    def pairing(self, P, Q):
        return self.final_exponentiation(self.miller_loop(P, Q))

    def multi_pairing(self, pairs):
        """prod e(P_i, Q_i): one shared final exponentiation."""
        F = self.F
        f = FQ12_ONE
        for P, Q in pairs:
            f = F.mul(f, self.miller_loop(P, Q))
        return self.final_exponentiation(f)


@lru_cache(maxsize=1)
def bls12_381() -> PairingEngine:
    return PairingEngine(
        p=fi.BLS12_381_P,
        r=fi.BLS12_381_R,
        xi=(1, 1),
        loop_count=-fi.BLS_X,  # |x|; x is negative
        loop_is_negative=True,
    )


BN254_T = 4965661367192848881  # BN parameter t; ate loop count = 6t + 2


@lru_cache(maxsize=1)
def bn254() -> PairingEngine:
    """BN254 ate pairing.

    The BN ate pairing needs two extra Frobenius line steps after the main
    6t+2 loop; handled in `miller_loop_bn` below.
    """
    eng = PairingEngine(
        p=fi.BN254_P,
        r=fi.BN254_R,
        xi=(9, 1),
        loop_count=6 * BN254_T + 2,
        loop_is_negative=False,
        twist="D",
    )
    eng._bn = True
    _orig_ml = eng.miller_loop

    def miller_loop_bn(P, Q):
        if P is None or Q is None:
            return FQ12_ONE
        F = eng.F
        p = eng.p
        f = _orig_ml(P, Q)
        # the two Frobenius correction lines: T = [6t+2]Q, add pi(Q), -pi^2(Q)
        Pe = eng.embed_g1(P)
        Qe = eng.untwist(Q)
        T = _ec_scalar(eng, Qe, 6 * BN254_T + 2)
        Q1 = _frobenius_point(eng, Qe, 1)
        Q2 = _frobenius_point(eng, Qe, 2)
        nQ2 = (Q2[0], F.neg(Q2[1]))
        f = F.mul(f, eng._line(T, Q1, Pe))
        T = eng._ec_add(T, Q1)
        f = F.mul(f, eng._line(T, nQ2, Pe))
        return f

    eng.miller_loop = miller_loop_bn
    return eng


def _ec_scalar(eng, P, k):
    R = None
    Q = P
    while k > 0:
        if k & 1:
            R = eng._ec_add(R, Q)
        Q = eng._ec_add(Q, Q)
        k >>= 1
    return R


def _frobenius_point(eng, P, power):
    """(x, y) -> (x^(p^power), y^(p^power)) on E(Fq12)."""
    e = eng.p**power
    return (eng.F.pow(P[0], e), eng.F.pow(P[1], e))
