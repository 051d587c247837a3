"""BLS12-377 / BW6-761 (recursion pair) parameter + curve validation.

The reference re-exports this pair as its recursion-friendly alternative
instantiation (circuits-ark/src/lib.rs:15-19).  Constants are derived
from the BLS family polynomials in x and re-verified here.
"""

from contangle_zkcp_tpu.curves import instances as ci
from contangle_zkcp_tpu.fields import instances as fi


def test_bls12_377_family_formulas():
    x = fi.BLS12_377_X
    assert fi.BLS12_377_R == x**4 - x**2 + 1
    assert fi.BLS12_377_P == ((x - 1) ** 2 * fi.BLS12_377_R) // 3 + x
    assert (x - 1) ** 2 % 3 == 0


def test_bw6_761_scalar_field_is_bls12_377_base():
    assert fi.BW6_761_R == fi.BLS12_377_P
    assert fi.BW6_761_P.bit_length() == 761


def test_generators_have_prime_order():
    for C in (ci.BLS12_377_G1, ci.BW6_761_G1):
        G = C.generator
        assert (G[1] ** 2 - G[0] ** 3 - C.a * G[0] - C.b) % C.p == 0
        assert C.mul(C.order, G) is None
        assert C.mul(C.order - 1, G) is not None


def test_bls12_377_field_arithmetic_device():
    import random

    F = fi.bls12_377_fr()
    rng = random.Random(3)
    xs = [rng.randrange(F.p) for _ in range(8)]
    ys = [rng.randrange(F.p) for _ in range(8)]
    got = F.decode(F.mul(F.encode(xs), F.encode(ys)))
    assert got == [(a * b) % F.p for a, b in zip(xs, ys)]


def test_bw6_761_field_arithmetic_device():
    import random

    F = fi.bw6_761_fq()
    rng = random.Random(4)
    xs = [rng.randrange(F.p) for _ in range(8)]
    ys = [rng.randrange(F.p) for _ in range(8)]
    got = F.decode(F.mul(F.encode(xs), F.encode(ys)))
    assert got == [(a * b) % F.p for a, b in zip(xs, ys)]
