"""Poseidon host/device consistency and sponge semantics."""

import random

import numpy as np

from contangle_zkcp_tpu.fields import instances
from contangle_zkcp_tpu.ops.poseidon import (
    PoseidonDevice,
    PoseidonHost,
    SpongeHost,
    p1_params,
)


def test_params_shape():
    F = instances.bls12_381_fr()
    ark, mds, alpha, rf, rp = p1_params(F.p)
    assert len(ark) == rf + rp == 39
    assert all(len(r) == 3 for r in ark)
    assert len(mds) == 3 and alpha == 17 and rf == 8 and rp == 31
    # constants must be reduced mod p
    assert all(0 <= x < F.p for row in ark for x in row)


def test_device_matches_host_permutation():
    F = instances.bls12_381_fr()
    host = PoseidonHost(F.p)
    dev = PoseidonDevice(F)
    rng = random.Random(7)
    states = [[rng.randrange(F.p) for _ in range(3)] for _ in range(5)]
    arr = np.stack([F.encode(s) for s in states])  # (5, 3, L) Mont
    out = dev.permute(arr)
    for i, s in enumerate(states):
        exp = host.permute(s)
        got = F.decode(np.asarray(out)[i])
        assert got == exp


def test_device_hash2_matches_host():
    F = instances.bls12_381_fr()
    host = PoseidonHost(F.p)
    dev = PoseidonDevice(F)
    rng = random.Random(8)
    xs = [rng.randrange(F.p) for _ in range(16)]
    ys = [rng.randrange(F.p) for _ in range(16)]
    got = F.decode(dev.hash2(F.encode(xs), F.encode(ys)))
    assert got == [host.hash2(x, y) for x, y in zip(xs, ys)]
    got1 = F.decode(dev.hash1(F.encode(xs)))
    assert got1 == [host.hash1(x) for x in xs]


def test_sponge_duplex_matches_fixed_patterns():
    # hash2/hash1 are the sponge driven through the fixed patterns
    F = instances.bls12_381_fr()
    host = PoseidonHost(F.p)
    rng = random.Random(9)
    x, y = rng.randrange(F.p), rng.randrange(F.p)
    sp = SpongeHost(host)
    sp.absorb([x, y])
    assert sp.squeeze(1)[0] == host.hash2(x, y)
    sp = SpongeHost(host)
    sp.absorb([x])
    assert sp.squeeze(1)[0] == host.hash1(x)


def test_sponge_multi_block_absorb():
    # absorbing 3 elements must permute between rate blocks
    F = instances.bls12_381_fr()
    host = PoseidonHost(F.p)
    a, b, c = 1, 2, 3
    sp = SpongeHost(host)
    sp.absorb([a, b, c])
    out = sp.squeeze(1)[0]
    # manual: state [0,a,b] -> permute -> add c at rate slot 0 -> squeeze
    st = host.permute([0, a, b])
    st[1] = (st[1] + c) % F.p
    st = host.permute(st)
    assert out == st[1]


def test_sponge_works_for_other_fields():
    # same constant set parses into any circuit field (mod p), as in the
    # reference's generic get_poseidon_params::<C>
    for F in [instances.bn254_fr(), instances.pasta_fp()]:
        host = PoseidonHost(F.p)
        h = host.hash2(123, 456)
        assert 0 <= h < F.p
