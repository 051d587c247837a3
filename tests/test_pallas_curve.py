"""Fused RCB point-add Pallas kernel: exactness vs host curve math
(interpret mode on CPU; compiled path exercised by TPU drive scripts)."""

import random

from contangle_zkcp_tpu.curves import instances as ci
from contangle_zkcp_tpu.curves.weierstrass import SWDevice
from contangle_zkcp_tpu.fields import instances as fi
from contangle_zkcp_tpu.ops import pallas_curve


def test_fused_rcb_add_matches_host():
    F = fi.bls12_381_fq()
    C = ci.BLS12_381_G1
    dev = SWDevice(F, C)
    eng = pallas_curve.PallasSWAdd(
        F, tuple(int(v) for v in dev._b3), lane_tile=128
    )
    rng = random.Random(55)
    G = C.generator
    pts1 = [C.mul(rng.randrange(1, C.order), G) for _ in range(13)]
    pts2 = [C.mul(rng.randrange(1, C.order), G) for _ in range(13)]
    # completeness cases: identity both sides, doubling, inverse pair
    pts1 += [None, G, G, G]
    pts2 += [G, None, G, (G[0], (-G[1]) % C.p)]
    P = dev.encode_points(pts1)
    Q = dev.encode_points(pts2)
    R = eng.add(P, Q, interpret=True)
    got = dev.decode_points(R)
    want = [C.add(a, b) for a, b in zip(pts1, pts2)]
    assert got == want


def test_fused_rcb_add_mxu_matches_host():
    """MXU constant-product reduction inside the fused add kernel."""
    F = fi.bls12_381_fq()
    C = ci.BLS12_381_G1
    dev = SWDevice(F, C)
    eng = pallas_curve.PallasSWAdd(
        F, tuple(int(v) for v in dev._b3), lane_tile=128, mxu=True
    )
    rng = random.Random(56)
    G = C.generator
    pts1 = [C.mul(rng.randrange(1, C.order), G) for _ in range(13)]
    pts2 = [C.mul(rng.randrange(1, C.order), G) for _ in range(13)]
    pts1 += [None, G, G, G]
    pts2 += [G, None, G, (G[0], (-G[1]) % C.p)]
    P = dev.encode_points(pts1)
    Q = dev.encode_points(pts2)
    R = eng.add(P, Q, interpret=True)
    got = dev.decode_points(R)
    want = [C.add(a, b) for a, b in zip(pts1, pts2)]
    assert got == want
