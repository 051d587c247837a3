"""Real PLONKish prover (IPA-backed) on the halo2-path ElGamal circuit."""

import random

from contangle_zkcp_tpu.fields import instances as fi
from contangle_zkcp_tpu.plonkish import (
    Assignment,
    CircuitMeta,
    ElGamalCircuit,
    ElGamalPallas,
    MockProver,
)
from contangle_zkcp_tpu.plonkish.prover import PlonkSystem


def _setup(seed=201):
    scheme = ElGamalPallas()
    rng = random.Random(seed)
    sk, pk = scheme.keygen(rng)
    r = rng.randrange(1, scheme.curve.order)
    m = rng.randrange(scheme.curve.p)
    (c1, c2), s = scheme.encrypt(pk, m, r)
    meta = CircuitMeta(p=fi.PASTA_P)
    circ = ElGamalCircuit.build(meta, s, c1, m, c2)
    n = 128
    asg = Assignment(meta, n)
    circ.synthesize(meta, asg)
    return meta, asg, (c1, c2), n


def test_plonk_prove_verify_elgamal():
    meta, asg, (c1, c2), n = _setup()
    instances = [[c1[0], c1[1], c2]]
    sys = PlonkSystem(meta, n, asg)
    proof = sys.prove(asg, instances)
    assert sys.verify(proof, instances)
    # wrong instance rejected
    bad = [[c1[0], c1[1], (c2 + 1) % fi.PASTA_P]]
    assert not sys.verify(proof, bad)


def test_plonk_rejects_cheating_witness():
    meta, asg, (c1, c2), n = _setup(202)
    instances = [[c1[0], c1[1], c2]]
    sys = PlonkSystem(meta, n, asg)
    # tamper one poseidon-trace cell: breaks a gate; proof must not verify
    asg.advice[0][5] = (asg.advice[0][5] + 1) % fi.PASTA_P
    assert MockProver(meta, asg, instances).verify() != []
    proof = sys.prove(asg, instances)
    assert not sys.verify(proof, instances)
