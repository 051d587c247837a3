"""Balanced-lane MSM engine (ops/msm_balanced.py) vs exact host math.

The engine replaces the lockstep bucket loop's heavy-bucket peel with
overflow lane segments (VERDICT r4 #1); these tests force every code
path with tiny windows/pools so XLA:CPU compiles stay fast:
  * skewed scalars (duplicates of 1 / small values) -> overflow
    segments + the masked fold scan;
  * uniform scalars -> pure grid path (no overflow, nlev=0);
  * signed and unsigned digit recode;
  * pow2 padding and the pad floor;
  * G2 (Fq2 coordinates).
"""

import random

import pytest

from contangle_zkcp_tpu.curves import instances as ci
from contangle_zkcp_tpu.curves.fq2_device import Fq2Device
from contangle_zkcp_tpu.curves.weierstrass import SWDevice
from contangle_zkcp_tpu.fields import instances as fi
from contangle_zkcp_tpu.ops.msm import msm_host
from contangle_zkcp_tpu.ops.msm_balanced import BalancedMSM


def _g1():
    C = ci.BLS12_381_G1
    return C, SWDevice(fi.bls12_381_fq(), C)


@pytest.mark.parametrize("c,signed", [(4, False), (4, True), (6, True)])
def test_balanced_skewed(c, signed):
    C, dev = _g1()
    rng = random.Random(5)
    n = 48
    pts = [C.mul(rng.randrange(1, C.order), C.generator) for _ in range(n)]
    # heavy skew: half the scalars are 1, some zero, a few wide
    scalars = [1] * 24 + [0, 0, 3, 3, 3, 3, 255, 255] + [
        rng.randrange(C.order) for _ in range(16)
    ]
    m = BalancedMSM(dev, scalar_bits=255, c=c, signed=signed,
                    overflow_lanes=32)
    got = m.run(pts, scalars)
    assert got == msm_host(C, pts, scalars)
    # overflow was actually exercised: at least one fold level
    sch = m.schedule(_limbs(scalars))
    assert sch["nlev"] >= 1


def test_balanced_uniform_no_overflow():
    C, dev = _g1()
    rng = random.Random(7)
    n = 32
    pts = [C.mul(rng.randrange(1, C.order), C.generator) for _ in range(n)]
    scalars = [rng.randrange(C.order) for _ in range(n)]
    scalars[0] = 0
    scalars[1] = C.order - 1
    m = BalancedMSM(dev, scalar_bits=255, c=6, signed=True,
                    overflow_lanes=32)
    got = m.run(pts, scalars)
    assert got == msm_host(C, pts, scalars)


def test_balanced_pad_floor_reuses_geometry():
    C, dev = _g1()
    rng = random.Random(9)
    pts = [C.mul(i + 1, C.generator) for i in range(32)]
    scalars = [rng.randrange(C.order) for _ in range(32)]
    m = BalancedMSM(dev, scalar_bits=255, c=4, signed=True,
                    overflow_lanes=32)
    big = m.run(pts, scalars)
    assert m._pad_floor == 32
    # a smaller MSM pads up to the floor and still computes exactly
    small = m.run(pts[:5], scalars[:5])
    assert m._pad_floor == 32
    assert small == msm_host(C, pts[:5], scalars[:5])
    assert big == msm_host(C, pts, scalars)


def test_balanced_g2():
    F2 = Fq2Device(fi.bls12_381_fq())
    dev = SWDevice(F2, b=ci.BLS12_381_G2_B)
    gen = (ci.BLS12_381_G2_GX, ci.BLS12_381_G2_GY)
    rng = random.Random(13)
    n = 16
    ks = [rng.randrange(1, 1 << 30) for _ in range(n)]
    pts = [dev.host_mul(k, gen) for k in ks]
    scalars = [1] * 8 + [rng.randrange(ci.BLS12_381_G1.order) for _ in range(8)]
    m = BalancedMSM(dev, scalar_bits=255, c=4, signed=True,
                    overflow_lanes=16)
    got = m.run(pts, scalars)
    r = ci.BLS12_381_G1.order
    want = dev.host_mul(sum(s * k for s, k in zip(scalars, ks)) % r, gen)
    assert got == want


def _limbs(scalars):
    import numpy as np

    from contangle_zkcp_tpu.fields.bigint import ints_to_limbs

    return np.asarray(ints_to_limbs(scalars, 16))
