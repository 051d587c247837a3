"""Pairing bilinearity and non-degeneracy (host engines)."""

import pytest

from contangle_zkcp_tpu.curves import instances as ci, pairing
from contangle_zkcp_tpu.curves.fq2_device import Fq2Device
from contangle_zkcp_tpu.curves.weierstrass import SWDevice
from contangle_zkcp_tpu.fields import instances as fi


def _g2_dev(p_is_bls=True):
    from contangle_zkcp_tpu.curves import fq2
    if p_is_bls:
        return SWDevice(Fq2Device(fi.bls12_381_fq()), b=ci.BLS12_381_G2_B)
    p = fi.BN254_P
    b2 = fq2.mul((3, 0), fq2.inv((9, 1), p), p)
    return SWDevice(Fq2Device(fi.bn254_fq()), b=b2)


def test_bls12_381_bilinearity():
    eng = pairing.bls12_381()
    G1 = ci.BLS12_381_G1
    g2dev = _g2_dev(True)
    G2 = (ci.BLS12_381_G2_GX, ci.BLS12_381_G2_GY)
    a, b = 7, 13
    e_ab = eng.pairing(G1.mul(a, G1.generator), g2dev.host_mul(b, G2))
    e_1 = eng.pairing(G1.generator, G2)
    assert e_1 != pairing.FQ12_ONE  # non-degenerate
    assert e_ab == eng.F.pow(e_1, a * b)
    # e(P, Q)^r == 1
    assert eng.F.pow(e_1, fi.BLS12_381_R) == pairing.FQ12_ONE


def test_bls12_381_multi_pairing_cancellation():
    eng = pairing.bls12_381()
    G1 = ci.BLS12_381_G1
    g2dev = _g2_dev(True)
    G2 = (ci.BLS12_381_G2_GX, ci.BLS12_381_G2_GY)
    # e(aG1, G2) * e(-aG1, G2) == 1
    P = G1.mul(5, G1.generator)
    res = eng.multi_pairing([(P, G2), (G1.neg(P), G2)])
    assert res == pairing.FQ12_ONE


def test_bn254_bilinearity():
    eng = pairing.bn254()
    G1 = ci.BN254_G1
    g2dev = _g2_dev(False)
    G2 = (ci.BN254_G2_GX, ci.BN254_G2_GY)
    a, b = 3, 5
    e_1 = eng.pairing(G1.generator, G2)
    assert e_1 != pairing.FQ12_ONE
    e_ab = eng.pairing(G1.mul(a, G1.generator), g2dev.host_mul(b, G2))
    assert e_ab == eng.F.pow(e_1, a * b)
    assert eng.F.pow(e_1, fi.BN254_R) == pairing.FQ12_ONE


def test_frobenius_map_matches_generic_pow():
    import random

    from contangle_zkcp_tpu.curves import pairing as pm

    eng = pm.bls12_381()
    F = eng.F
    rng = random.Random(11)

    def rand_fq12():
        rnd = lambda: (rng.randrange(eng.p), rng.randrange(eng.p))
        return ((rnd(), rnd(), rnd()), (rnd(), rnd(), rnd()))

    a = rand_fq12()
    for m in (1, 2, 3):
        assert F.frobenius(a, m) == F.pow(a, eng.p**m)


def test_bls_final_exp_chain_matches_generic():
    """The factorized hard-part chain computes f^(3*(p^12-1)/r)."""
    import random

    from contangle_zkcp_tpu.curves import pairing as pm

    eng = pm.bls12_381()
    F = eng.F
    rng = random.Random(12)
    rnd = lambda: (rng.randrange(eng.p), rng.randrange(eng.p))
    f = ((rnd(), rnd(), rnd()), (rnd(), rnd(), rnd()))
    got = eng.final_exponentiation(f)
    want = F.pow(f, 3 * eng.final_power)
    assert got == want
