"""Batched device curve ops vs exact host arithmetic."""

import random

import numpy as np

from contangle_zkcp_tpu.curves import fq2, instances as ci
from contangle_zkcp_tpu.curves.edwards import EdwardsDevice
from contangle_zkcp_tpu.curves.fq2_device import Fq2Device
from contangle_zkcp_tpu.curves.weierstrass import SWDevice
from contangle_zkcp_tpu.fields import instances as fi
from contangle_zkcp_tpu.utils.serialize import (
    edwards_from_bytes,
    edwards_to_bytes,
    fp_from_bytes,
)

ALICE_PK = "7a9b475fcd963e7a8210b8863e8d5b8ca36902860ce10dd5b951932b2bba44bb"


def test_jubjub_constants():
    J = ci.JUBJUB
    assert J.is_on_curve(J.generator)
    assert J.mul(J.order, J.generator) == (0, 1)
    # d = -(10240/10241)
    assert (J.d * 10241 + 10240) % J.p == 0


def test_reference_pk_decodes():
    # the reference's golden public key must decode onto our curve
    # (validates d and the y||sign-of-x compressed format).
    P = edwards_from_bytes(bytes.fromhex(ALICE_PK), ci.JUBJUB)
    assert ci.JUBJUB.is_on_curve(P)
    assert edwards_to_bytes(P, ci.JUBJUB).hex() == ALICE_PK


def test_edwards_device_matches_host():
    J = ci.JUBJUB
    F = fi.jubjub_fq()
    dev = EdwardsDevice(F, J)
    rng = random.Random(11)
    ks = [rng.randrange(1, J.order) for _ in range(4)]
    pts = [J.mul(k, J.generator) for k in ks]
    P = dev.encode_points(pts)
    # device add of consecutive pairs
    Q = dev.encode_points(pts[1:] + pts[:1])
    got = dev.decode_points(dev.add(P, Q))
    exp = [J.add(a, b) for a, b in zip(pts, pts[1:] + pts[:1])]
    assert got == exp
    got = dev.decode_points(dev.double(P))
    assert got == [J.add(a, a) for a in pts]


def test_edwards_device_scalar_mul():
    J = ci.JUBJUB
    F = fi.jubjub_fq()
    dev = EdwardsDevice(F, J)
    rng = random.Random(12)
    ks = [rng.randrange(1, J.order) for _ in range(3)] + [1, 2]
    G = dev.encode_points([J.generator] * len(ks))
    got = dev.decode_points(dev.scalar_mul_ints(G, ks))
    exp = [J.mul(k, J.generator) for k in ks]
    assert got == exp


def test_sw_device_matches_host_g1():
    C = ci.BLS12_381_G1
    F = fi.bls12_381_fq()
    dev = SWDevice(F, C)
    rng = random.Random(13)
    ks = [rng.randrange(1, C.order) for _ in range(3)]
    pts = [C.mul(k, C.generator) for k in ks]
    P = dev.encode_points(pts)
    Q = dev.encode_points(pts[1:] + pts[:1])
    got = dev.decode_points(dev.add(P, Q))
    exp = [C.add(a, b) for a, b in zip(pts, pts[1:] + pts[:1])]
    assert got == exp
    # doubling path (P == Q) via the masked add
    got = dev.decode_points(dev.add(P, P))
    assert got == [C.add(a, a) for a in pts]
    # P + (-P) = infinity
    N = dev.encode_points([C.neg(p) for p in pts])
    got = dev.decode_points(dev.add(P, N))
    assert got == [None] * len(pts)
    # identity absorbing
    I = dev.identity((len(pts),))
    got = dev.decode_points(dev.add(P, I))
    assert got == pts


def test_sw_device_scalar_mul_g1():
    C = ci.BLS12_381_G1
    F = fi.bls12_381_fq()
    dev = SWDevice(F, C)
    rng = random.Random(14)
    ks = [rng.randrange(1, C.order) for _ in range(3)] + [1]
    G = dev.encode_points([C.generator] * len(ks))
    got = dev.decode_points(dev.scalar_mul_ints(G, ks, 256))
    exp = [C.mul(k, C.generator) for k in ks]
    assert got == exp


def test_sw_device_g2():
    p = fi.BLS12_381_P
    F2 = Fq2Device(fi.bls12_381_fq())
    dev = SWDevice(F2, b=ci.BLS12_381_G2_B)
    gen = (ci.BLS12_381_G2_GX, ci.BLS12_381_G2_GY)
    # generator satisfies y^2 = x^3 + 4(u+1)
    lhs = fq2.square(gen[1], p)
    rhs = fq2.add(fq2.mul(fq2.square(gen[0], p), gen[0], p), (4, 4), p)
    assert lhs == rhs
    G = dev.encode_points([gen, gen])
    # 2G + G == 3G
    two = dev.add(G, G)
    three = dev.add(two, G)
    got3 = dev.decode_points(three)
    exp3 = dev.decode_points(dev.scalar_mul_ints(G, [3, 3], 4))
    assert got3 == exp3
    # order * G == infinity (subgroup check)
    got = dev.decode_points(dev.scalar_mul_ints(G, [fi.BLS12_381_R], 256))
    assert got[0] is None


def test_fq2_device_matches_host():
    p = fi.BLS12_381_P
    F2 = Fq2Device(fi.bls12_381_fq())
    rng = random.Random(15)
    xs = [(rng.randrange(p), rng.randrange(p)) for _ in range(8)]
    ys = [(rng.randrange(p), rng.randrange(p)) for _ in range(8)]
    a, b = F2.encode(xs), F2.encode(ys)
    assert F2.decode(F2.mul(a, b)) == [fq2.mul(x, y, p) for x, y in zip(xs, ys)]
    assert F2.decode(F2.inv(a)) == [fq2.inv(x, p) for x in xs]
    assert F2.decode(F2.square(a)) == [fq2.square(x, p) for x in xs]
