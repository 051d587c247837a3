"""Host-side Fq2 = Fq[u]/(u^2 + 1) helpers (BLS12-381 / BN254 towers).

Elements are (c0, c1) int tuples.  Device Fq2 lives in `fq2_device.py`.
"""

from __future__ import annotations

from .host import sqrt_mod


def add(a, b, p):
    return ((a[0] + b[0]) % p, (a[1] + b[1]) % p)


def sub(a, b, p):
    return ((a[0] - b[0]) % p, (a[1] - b[1]) % p)


def neg(a, p):
    return ((-a[0]) % p, (-a[1]) % p)


def mul(a, b, p):
    # (a0 + a1 u)(b0 + b1 u) with u^2 = -1
    v0 = a[0] * b[0] % p
    v1 = a[1] * b[1] % p
    c0 = (v0 - v1) % p
    c1 = ((a[0] + a[1]) * (b[0] + b[1]) - v0 - v1) % p
    return (c0, c1)


def square(a, p):
    c0 = (a[0] + a[1]) * (a[0] - a[1]) % p
    c1 = 2 * a[0] * a[1] % p
    return (c0, c1)


def scalar_mul(a, k, p):
    return (a[0] * k % p, a[1] * k % p)


def inv(a, p):
    norm = (a[0] * a[0] + a[1] * a[1]) % p
    ninv = pow(norm, -1, p)
    return (a[0] * ninv % p, (-a[1]) * ninv % p)


def conj(a, p):
    return (a[0], (-a[1]) % p)


def is_zero(a):
    return a[0] == 0 and a[1] == 0


def sqrt(a, p):
    """Square root in Fq2 (p ≡ 3 mod 4 for both BLS12-381 and BN254 Fq).

    Uses the complex method: for a = x + y*u, find c = sqrt(x^2+y^2) in Fq,
    then r0 = sqrt((x+c)/2), r1 = y/(2 r0).
    """
    x, y = a
    if y == 0:
        r = sqrt_mod(x, p)
        if r is not None:
            return (r, 0)
        # sqrt of non-residue: x = -(r'^2) with u^2=-1 => root is r'*u
        r = sqrt_mod((-x) % p, p)
        if r is None:
            return None
        return (0, r)
    c = sqrt_mod((x * x + y * y) % p, p)
    if c is None:
        return None
    inv2 = pow(2, -1, p)
    for cc in (c, (-c) % p):
        t = (x + cc) * inv2 % p
        r0 = sqrt_mod(t, p)
        if r0 is None:
            continue
        r1 = y * pow(2 * r0 % p, -1, p) % p
        cand = (r0, r1)
        if square(cand, p) == (x % p, y % p):
            return cand
    return None
