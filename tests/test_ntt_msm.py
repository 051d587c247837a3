"""NTT and MSM kernel correctness vs exact host computation."""

import random

import numpy as np
import pytest

from contangle_zkcp_tpu.curves import instances as ci
from contangle_zkcp_tpu.curves.fq2_device import Fq2Device
from contangle_zkcp_tpu.curves.weierstrass import SWDevice
from contangle_zkcp_tpu.fields import instances as fi
from contangle_zkcp_tpu.ops.msm import MSM, msm_host
from contangle_zkcp_tpu.ops.ntt import NTT


def test_ntt_roundtrip_and_values():
    F = fi.bls12_381_fr()
    n = 32
    eng = NTT(F, n)
    rng = random.Random(21)
    coeffs = [rng.randrange(F.p) for _ in range(n)]
    a = F.encode(coeffs)
    ev = eng.forward(a)
    # values match exact host evaluation
    assert F.decode(ev) == eng.h_forward(coeffs)
    # inverse returns the coefficients
    back = eng.inverse(ev)
    assert F.decode(back) == coeffs


def test_ntt_coset_roundtrip():
    F = fi.bls12_381_fr()
    n = 16
    eng = NTT(F, n)
    rng = random.Random(22)
    coeffs = [rng.randrange(F.p) for _ in range(n)]
    g = fi.FIELD_GENERATORS[F.p]
    a = F.encode(coeffs)
    ev = eng.coset_forward(a, g)
    # coset evaluation at g*w^i
    p = F.p
    exp = []
    for i in range(n):
        x = g * pow(eng.omega, i, p) % p
        acc = 0
        for c in reversed(coeffs):
            acc = (acc * x + c) % p
        exp.append(acc)
    assert F.decode(ev) == exp
    back = eng.coset_inverse(ev, g)
    assert F.decode(back) == coeffs


def test_ntt_other_fields():
    for F in [fi.bn254_fr(), fi.pasta_fp()]:
        eng = NTT(F, 8)
        coeffs = list(range(1, 9))
        ev = eng.forward(F.encode(coeffs))
        assert F.decode(ev) == eng.h_forward(coeffs)


@pytest.mark.parametrize("c", [4, 8])
def test_msm_g1(c):
    C = ci.BLS12_381_G1
    F = fi.bls12_381_fq()
    dev = SWDevice(F, C)
    rng = random.Random(23)
    n = 64
    pts = [C.mul(rng.randrange(1, C.order), C.generator) for _ in range(n)]
    scalars = [rng.randrange(C.order) for _ in range(n)]
    # include edge scalars
    scalars[0] = 0
    scalars[1] = 1
    scalars[2] = C.order - 1
    m = MSM(dev, scalar_bits=255, c=c)
    got = m.run(pts, scalars)
    exp = msm_host(C, pts, scalars)
    assert got == exp


def test_msm_with_duplicate_points_and_zero():
    C = ci.BLS12_381_G1
    F = fi.bls12_381_fq()
    dev = SWDevice(F, C)
    pts = [C.generator] * 8  # forces equal-point additions in buckets
    scalars = [5, 5, 5, 7, 0, 0, 1, C.order - 2]
    m = MSM(dev, scalar_bits=255, c=4)
    got = m.run(pts, scalars)
    exp = msm_host(C, pts, scalars)
    assert got == exp


def test_msm_g2():
    F2 = Fq2Device(fi.bls12_381_fq())
    dev = SWDevice(F2, b=ci.BLS12_381_G2_B)
    gen = (ci.BLS12_381_G2_GX, ci.BLS12_381_G2_GY)
    rng = random.Random(24)
    base = [dev.host_mul(rng.randrange(1, fi.BLS12_381_R), gen) for _ in range(6)]
    scalars = [rng.randrange(fi.BLS12_381_R) for _ in range(6)]
    m = MSM(dev, scalar_bits=255, c=4)
    got = m.run(base, scalars)
    exp = None
    for P, s in zip(base, scalars):
        exp = dev.host_add(exp, dev.host_mul(s, P))
    assert got == exp


def test_msm_alias_spread_top_window():
    """c=12 leaves a 3-bit top window (255 = 21*12 + 3): its buckets are
    alias-spread by the host schedule and folded on device — the config
    that previously exploded the lockstep trip count."""
    import random

    from contangle_zkcp_tpu.curves import instances as ci
    from contangle_zkcp_tpu.curves.weierstrass import SWDevice
    from contangle_zkcp_tpu.fields import instances as fi
    from contangle_zkcp_tpu.ops.msm import MSM, msm_host

    C = ci.BLS12_381_G1
    dev = SWDevice(fi.bls12_381_fq(), C)
    rng = random.Random(99)
    n = 64
    pts = [C.mul(rng.randrange(1, C.order), C.generator) for _ in range(n)]
    scalars = [rng.randrange(C.order) for _ in range(n)]
    msm = MSM(dev, scalar_bits=255, c=12)
    assert msm.run(pts, scalars) == msm_host(C, pts, scalars)


def test_msm_heavy_bucket_peeling():
    """Witness-like skewed scalars (mostly 0/1 bits): over-occupied buckets
    are peeled out of the lockstep schedule and tree-reduced on device.
    Thresholds shrunk so the peel path actually triggers at test size."""
    C = ci.BLS12_381_G1
    dev = SWDevice(fi.bls12_381_fq(), C)
    rng = random.Random(41)
    n = 64
    pts = [C.mul(rng.randrange(1, C.order), C.generator) for _ in range(n)]
    # ~half the scalars are exactly 1 -> window-0 bucket 1 holds ~32 points
    scalars = [
        1 if rng.random() < 0.5 else rng.randrange(C.order) for _ in range(n)
    ]
    m = MSM(dev, scalar_bits=255, c=8)
    m.HEAVY_CNT = 4
    m.TREE_CHUNK = 8
    m.TREE_ROWS = 2
    got = m.run(pts, scalars)
    assert got == msm_host(C, pts, scalars)
    # and with peeling left at defaults (no trigger) the answer agrees too
    m2 = MSM(dev, scalar_bits=255, c=8)
    assert m2.run(pts, scalars) == got


def test_msm_gather_chunking():
    """MSMs whose packed gather source would exceed MAX_GATHER_BYTES are
    split into power-of-two chunks host-added together (the G2-at-2^20
    wrong-result workaround).  Forced here at tiny scale."""
    import random

    from contangle_zkcp_tpu.curves import instances as ci
    from contangle_zkcp_tpu.curves.weierstrass import SWDevice
    from contangle_zkcp_tpu.fields import instances as fi
    from contangle_zkcp_tpu.ops.msm import MSM, msm_host

    C = ci.BLS12_381_G1
    dev = SWDevice(fi.bls12_381_fq(), C)
    rng = random.Random(77)
    n = 24
    pts = [C.mul(rng.randrange(1, C.order), C.generator) for _ in range(n)]
    scalars = [rng.randrange(C.order) for _ in range(n)]
    m = MSM(dev, scalar_bits=255, c=4)
    assert m._chunk_rows(dev.encode_points(pts)) >= n  # sanity: no split
    m.MAX_GATHER_BYTES = 8 * 512  # 8 G1 rows -> 4 chunks of 8 (pow2)
    enc = dev.encode_points(pts)
    assert m._chunk_rows(enc) == 8
    got = m.run(enc, scalars)
    exp = msm_host(C, pts, scalars)
    assert got == exp


def test_msm_chunked_run_matches_host():
    """run() splits MSMs whose packed gather source would exceed
    MAX_GATHER_BYTES into power-of-two chunks and host-folds the partial
    results (ops/msm.py:414-463).  Shrink the bound so a 64-point MSM
    takes the chunked path (16-point chunks) and must still be exact,
    including a non-power-of-two tail chunk."""
    C = ci.BLS12_381_G1
    F = fi.bls12_381_fq()
    dev = SWDevice(F, C)
    rng = random.Random(29)
    n = 56  # chunks: 16, 16, 16, 8-tail
    pts = [C.mul(rng.randrange(1, C.order), C.generator) for _ in range(n)]
    scalars = [rng.randrange(C.order) for _ in range(n)]
    scalars[3] = 0
    m = MSM(dev, scalar_bits=255, c=4)
    row = 3 * 24  # x,y,z coordinate limbs per point
    row_bytes = (-(-row // 128) * 128) * 4
    m.MAX_GATHER_BYTES = 16 * row_bytes
    assert m._chunk_rows(m.dev.encode_points(pts[:1])) == 16
    got = m.run(pts, scalars)
    exp = msm_host(C, pts, scalars)
    assert got == exp


@pytest.mark.parametrize("c", [4, 8])
def test_msm_signed_digits(c):
    """Signed-window engine (ops/msm.py signed=True): digits recoded to
    [-2^(c-1), 2^(c-1)-1] with carry, negative digits folded into the
    gather as y-negation, bucket lanes weighted lane+1."""
    C = ci.BLS12_381_G1
    F = fi.bls12_381_fq()
    dev = SWDevice(F, C)
    rng = random.Random(31)
    n = 64
    pts = [C.mul(rng.randrange(1, C.order), C.generator) for _ in range(n)]
    scalars = [rng.randrange(C.order) for _ in range(n)]
    scalars[0] = 0
    scalars[1] = 1
    scalars[2] = C.order - 1  # all-negative-digit tail
    scalars[3] = (1 << (c - 1)) - 1  # max positive digit
    scalars[4] = 1 << (c - 1)  # recodes to -2^(c-1) + carry
    scalars[5] = (1 << c) - 1  # -1 + carry
    m = MSM(dev, scalar_bits=255, c=c, signed=True)
    got = m.run(pts, scalars)
    exp = msm_host(C, pts, scalars)
    assert got == exp


def test_msm_signed_heavy_peel_and_duplicates():
    """Signed schedule through the heavy-peel path: skewed small scalars
    concentrate one bucket past the (lowered) threshold; peeled tree sums
    must apply the gather-negation too."""
    C = ci.BLS12_381_G1
    F = fi.bls12_381_fq()
    dev = SWDevice(F, C)
    rng = random.Random(37)
    n = 32
    pts = [C.mul(rng.randrange(1, C.order), C.generator) for _ in range(n)]
    # skew: half the scalars are 15 (= -1 + carry at c=4), forcing the
    # |d|=1-negated bucket heavy; rest random
    scalars = [15 if i % 2 == 0 else rng.randrange(C.order) for i in range(n)]
    m = MSM(dev, scalar_bits=255, c=4, signed=True)
    m.HEAVY_CNT = 4
    m.TREE_CHUNK = 8
    m.TREE_ROWS = 2
    got = m.run(pts, scalars)
    exp = msm_host(C, pts, scalars)
    assert got == exp


def test_msm_signed_chunked_run():
    """Signed engine through the chunked-run path (both features at once:
    ops/msm.py MAX_GATHER_BYTES splitting + signed schedule per chunk)."""
    C = ci.BLS12_381_G1
    F = fi.bls12_381_fq()
    dev = SWDevice(F, C)
    rng = random.Random(41)
    n = 48  # 16,16,16 chunks
    pts = [C.mul(rng.randrange(1, C.order), C.generator) for _ in range(n)]
    scalars = [rng.randrange(C.order) for _ in range(n)]
    m = MSM(dev, scalar_bits=255, c=4, signed=True)
    row_bytes = (-(-(3 * 24) // 128) * 128) * 4
    m.MAX_GATHER_BYTES = 16 * row_bytes
    got = m.run(pts, scalars)
    exp = msm_host(C, pts, scalars)
    assert got == exp
