"""Device windowed fixed-base batch multiplier vs exact host math."""

import random

from contangle_zkcp_tpu.curves import instances as ci
from contangle_zkcp_tpu.curves.weierstrass import SWDevice
from contangle_zkcp_tpu.fields import instances as fi
from contangle_zkcp_tpu.ops.fixed_base import FixedBaseDevice


def test_fixed_base_batch_matches_host():
    F = fi.bls12_381_fq()
    C = ci.BLS12_381_G1
    dev = SWDevice(F, C)
    eng = FixedBaseDevice(dev, C.generator, bits=C.order.bit_length(), c=8)
    rng = random.Random(77)
    ks = [rng.randrange(C.order) for _ in range(6)] + [0, 1, C.order - 1]
    got = eng.mul_ints_host(ks)
    want = [C.mul(k, C.generator) for k in ks]
    assert got == want
