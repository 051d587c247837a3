"""Halo2-equivalent pipeline: Pow5 Poseidon, ElGamal circuit + MockProver, IPA."""

import random

import pytest

from contangle_zkcp_tpu.fields import instances as fi
from contangle_zkcp_tpu.plonkish import (
    IPA,
    CircuitMeta,
    ElGamalCircuit,
    ElGamalPallas,
    MockProver,
    PoseidonPow5Host,
)


def test_pow5_constants_shape():
    pos = PoseidonPow5Host()
    assert len(pos.rc) == 64 and all(len(r) == 3 for r in pos.rc)
    # MDS is invertible (Cauchy) and all entries in-field
    p = pos.p
    det = (
        pos.mds[0][0] * (pos.mds[1][1] * pos.mds[2][2] - pos.mds[1][2] * pos.mds[2][1])
        - pos.mds[0][1] * (pos.mds[1][0] * pos.mds[2][2] - pos.mds[1][2] * pos.mds[2][0])
        + pos.mds[0][2] * (pos.mds[1][0] * pos.mds[2][1] - pos.mds[1][1] * pos.mds[2][0])
    ) % p
    assert det != 0


def test_elgamal_pallas_roundtrip():
    scheme = ElGamalPallas()
    rng = random.Random(91)
    sk, pk = scheme.keygen(rng)
    r = rng.randrange(1, scheme.curve.order)
    m = rng.randrange(scheme.curve.p)
    cipher, s = scheme.encrypt(pk, m, r)
    assert scheme.decrypt(sk, cipher) == m


def test_elgamal_circuit_mock_prover():
    # mirrors the reference's test_circuit_elgmal (MockProver run + verify)
    scheme = ElGamalPallas()
    rng = random.Random(92)
    sk, pk = scheme.keygen(rng)
    r = rng.randrange(1, scheme.curve.order)
    m = rng.randrange(scheme.curve.p)
    (c1, c2), s = scheme.encrypt(pk, m, r)
    meta = CircuitMeta(p=fi.PASTA_P)
    circ = ElGamalCircuit.build(meta, s, c1, m, c2)
    n_rows = 128
    prover = MockProver.run(meta, circ, n_rows, [[c1[0], c1[1], c2]])
    assert prover.verify() == []
    # wrong instance (tampered c2) must fail
    prover2 = MockProver.run(meta, circ, n_rows, [[c1[0], c1[1], (c2 + 1) % fi.PASTA_P]])
    assert prover2.verify() != []
    # off-curve witnessed point must fail the curve gate
    bad = ElGamalCircuit.build(CircuitMeta(p=fi.PASTA_P), (s[0], (s[1] + 1) % fi.PASTA_P), c1, m, c2)
    meta_bad = CircuitMeta(p=fi.PASTA_P)
    bad = ElGamalCircuit.build(meta_bad, (s[0], (s[1] + 1) % fi.PASTA_P), c1, m, c2)
    prover3 = MockProver.run(meta_bad, bad, n_rows, [[c1[0], c1[1], c2]])
    assert prover3.verify() != []


def test_ipa_commit_open_verify():
    rng = random.Random(93)
    n = 16
    ipa = IPA(n)
    coeffs = [rng.randrange(fi.PASTA_P) for _ in range(n)]
    comm = ipa.commit(coeffs)
    x = rng.randrange(fi.PASTA_P)
    v = 0
    for c in reversed(coeffs):
        v = (v * x + c) % fi.PASTA_P
    proof = ipa.open(coeffs, x)
    assert ipa.verify(comm, x, v, proof)
    # wrong evaluation rejected
    assert not ipa.verify(comm, x, (v + 1) % fi.PASTA_P, proof)
    # wrong point rejected
    assert not ipa.verify(comm, (x + 1) % fi.PASTA_P, v, proof)
