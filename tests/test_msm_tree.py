"""Batch-affine tree MSM (ops/msm_tree.py) vs exact host math.

Covers the complete-addition case analysis the affine formulation must
get right: duplicated points (double path), P + (-P) cancellations,
identity inputs, zero scalars, witness-skewed digit distributions (the
case the old engine needed heavy-bucket peeling for), signed and
unsigned schedules, G1 and G2, and multi-chunk accumulation.
"""

import random

import numpy as np
import pytest

from contangle_zkcp_tpu.curves import instances as ci
from contangle_zkcp_tpu.curves.fq2_device import Fq2Device
from contangle_zkcp_tpu.curves.weierstrass import SWDevice
from contangle_zkcp_tpu.fields import instances as fi
from contangle_zkcp_tpu.ops.msm import msm_host
from contangle_zkcp_tpu.ops.msm_tree import TreeMSM, _menu_round, _next_pow2


def _g1_dev():
    return SWDevice(fi.bls12_381_fq(), ci.BLS12_381_G1)


def _points(curve, rng, n):
    return [curve.mul(rng.randrange(1, curve.order), curve.generator) for _ in range(n)]


def test_next_pow2_and_menu():
    assert list(_next_pow2(np.array([0, 1, 2, 3, 4, 5, 100]))) == [
        0, 1, 2, 4, 4, 8, 128,
    ]
    assert _menu_round(1) == 256
    assert _menu_round(257) == 320
    assert _menu_round(320) == 320
    assert _menu_round(1000) == 1024
    assert _menu_round(1100) == 1280


@pytest.mark.parametrize("signed", [False, True])
def test_tree_msm_random_small(signed):
    rng = random.Random(11)
    C = ci.BLS12_381_G1
    dev = _g1_dev()
    msm = TreeMSM(dev, scalar_bits=255, c=8, signed=signed)
    n = 73
    pts = _points(C, rng, n)
    scal = [rng.randrange(C.order) for _ in range(n)]
    scal[0] = 0  # zero scalar
    got = msm.run(pts, scal)
    assert got == msm_host(C, pts, scal)


def test_tree_msm_duplicates_and_cancellations():
    """Duplicate points land in the same bucket (double path) and
    P + (-P) pairs cancel (invalid-slot path)."""
    rng = random.Random(5)
    C = ci.BLS12_381_G1
    dev = _g1_dev()
    msm = TreeMSM(dev, scalar_bits=255, c=8, signed=True)
    P = C.mul(12345, C.generator)
    negP = (P[0], (-P[1]) % C.curve_p if hasattr(C, "curve_p") else None)
    # build the negation through the curve API instead
    negP = C.neg(P) if hasattr(C, "neg") else (P[0], C.p - P[1])
    s = rng.randrange(C.order)
    pts = [P, P, P, negP, C.generator, C.generator]
    scal = [s, s, s, s, 7, 7]  # same digits everywhere
    got = msm.run(pts, scal)
    assert got == msm_host(C, pts, scal)


def test_tree_msm_identity_inputs():
    rng = random.Random(6)
    C = ci.BLS12_381_G1
    dev = _g1_dev()
    msm = TreeMSM(dev, scalar_bits=255, c=8, signed=True)
    pts = _points(C, rng, 5) + [None, None]
    scal = [rng.randrange(C.order) for _ in range(7)]
    enc = dev.encode_points(pts)
    got = msm.run(enc, scal)
    want = msm_host(C, pts[:5], scal[:5])
    assert got == want


def test_tree_msm_skewed_witness_like():
    """0/1-heavy scalars: one bucket takes ~half of all points — the
    case the lockstep engine needed heavy-bucket peeling for."""
    rng = random.Random(7)
    C = ci.BLS12_381_G1
    dev = _g1_dev()
    msm = TreeMSM(dev, scalar_bits=255, c=8, signed=True)
    n = 200
    pts = _points(C, rng, n)
    scal = [rng.choice([0, 1, 1, 1, 2, 255]) for _ in range(n)]
    scal[3] = rng.randrange(C.order)
    got = msm.run(pts, scal)
    assert got == msm_host(C, pts, scal)


def test_tree_msm_multichunk():
    """Force several chunks through a tiny A0 budget."""
    rng = random.Random(8)
    C = ci.BLS12_381_G1
    dev = _g1_dev()
    msm = TreeMSM(dev, scalar_bits=255, c=8, signed=True)
    msm.A0_BUDGET_BYTES = 1 << 21  # chunk = 128 points at c=8 signed
    assert msm._chunk_rows(dev.encode_points(_points(C, rng, 1))) < 150
    n = 150
    pts = _points(C, rng, n)
    scal = [rng.randrange(C.order) for _ in range(n)]
    got = msm.run(pts, scal)
    assert got == msm_host(C, pts, scal)


def test_tree_msm_g2():
    rng = random.Random(9)
    host = ci.BLS12_381_G2
    Fq = fi.bls12_381_fq()
    dev = SWDevice(Fq2Device(Fq), host)
    msm = TreeMSM(dev, scalar_bits=255, c=8, signed=True)
    n = 37
    pts = [host.mul(rng.randrange(1, host.order), host.generator) for _ in range(n)]
    scal = [rng.randrange(host.order) for _ in range(n)]
    got = msm.run(pts, scal)
    assert got == msm_host(host, pts, scal)


def test_tree_msm_tiled_path():
    """Force the fixed-tile execution path (TILE smaller than the slot
    array): gather tiles, pair2 tile steps, tail collapse, per-tile
    harvest — exact vs host math, including a skewed bucket spanning
    multiple tiles."""
    rng = random.Random(12)
    C = ci.BLS12_381_G1
    dev = _g1_dev()
    msm = TreeMSM(dev, scalar_bits=255, c=8, signed=True)
    msm.TILE = 256  # slot array (~1.5*K*n) >> TILE -> many tiles
    n = 192
    pts = _points(C, rng, n)
    scal = [rng.randrange(C.order) for _ in range(n)]
    scal[: n // 3] = [7] * (n // 3)  # skew: one bucket > a whole tile
    got = msm.run(pts, scal)
    assert got == msm_host(C, pts, scal)


def test_tree_msm_matches_lockstep_engine():
    """Cross-engine agreement on the same inputs."""
    from contangle_zkcp_tpu.ops.msm import MSM

    rng = random.Random(10)
    C = ci.BLS12_381_G1
    dev = _g1_dev()
    n = 96
    pts = _points(C, rng, n)
    scal = [rng.randrange(C.order) for _ in range(n)]
    a = TreeMSM(dev, scalar_bits=255, c=8, signed=True).run(pts, scal)
    b = MSM(dev, scalar_bits=255, c=8, signed=True).run(pts, scal)
    assert a == b
