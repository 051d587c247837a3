"""Groth16 end-to-end on toy circuits (CPU-sized).

The full Proof-of-Encryption circuit runs on TPU via bench/e2e drives;
these tests keep the prover's whole pipeline (QAP -> NTT -> MSM ->
pairing check) covered at unit-test scale.
"""

import random

import pytest

from contangle_zkcp_tpu.groth16 import Groth16
from contangle_zkcp_tpu.r1cs.builder import ConstraintSystem
from contangle_zkcp_tpu.r1cs.gadgets import Gadgets


def toy_circuit(p, x=3, y=5, bump=0):
    """Public: z = x*y, w = x+y; witness: x, y, plus a few extras."""
    cs = ConstraintSystem(p=p)
    g = Gadgets(cs)
    xv = g.witness(x)
    yv = g.witness(y)
    prod = g.mul(xv, yv)
    zin = g.input((x * y + bump) % p)
    win = g.input((x + y) % p)
    g.enforce_equal(prod, zin)
    g.enforce_equal(xv + yv, win)
    # some extra structure: cube and a boolean
    cube = g.mul(prod, xv)
    b = g.alloc_bit(1)
    g.enforce_equal(g.mul(cube, b), cube)
    return cs


@pytest.mark.parametrize("curve", ["bls12_381", "bn254"])
def test_groth16_roundtrip(curve):
    eng = Groth16(curve)
    p = eng.ctx.r
    rng = random.Random(41)
    cs = toy_circuit(p)
    assert cs.is_satisfied()
    pk, vk = eng.setup(cs, rng)
    proof = eng.prove(pk, cs, rng)
    inputs = cs.public_inputs()
    assert eng.verify(vk, inputs, proof)
    # wrong public input rejected
    bad = list(inputs)
    bad[0] = (bad[0] + 1) % p
    assert not eng.verify(vk, bad, proof)
    # corrupted proof rejected
    from contangle_zkcp_tpu.groth16 import Proof

    g1 = eng.ctx.g1
    tam = Proof(a=g1.add(proof.a, g1.generator), b=proof.b, c=proof.c)
    assert not eng.verify(vk, inputs, tam)


def test_groth16_unsatisfied_circuit_proof_fails():
    eng = Groth16("bls12_381")
    p = eng.ctx.r
    rng = random.Random(42)
    cs = toy_circuit(p)
    pk, vk = eng.setup(cs, rng)
    # different (inconsistent) instance: bump the public product input
    cs_bad = toy_circuit(p, bump=1)
    assert not cs_bad.is_satisfied()
    proof = eng.prove(pk, cs_bad, rng)
    assert not eng.verify(vk, cs_bad.public_inputs(), proof)


def test_groth16_proof_is_randomized_but_stable_inputs():
    eng = Groth16("bls12_381")
    p = eng.ctx.r
    rng = random.Random(43)
    cs = toy_circuit(p)
    pk, vk = eng.setup(cs, rng)
    p1 = eng.prove(pk, cs, rng)
    p2 = eng.prove(pk, cs, rng)
    assert p1.a != p2.a  # fresh (r, s) per proof
    assert eng.verify(vk, cs.public_inputs(), p1)
    assert eng.verify(vk, cs.public_inputs(), p2)


def test_groth16_device_crs_roundtrip():
    """engine='device' setup (batched fixed-base CRS, device-resident
    queries) proves + verifies like the host engine."""
    rng = random.Random(9)
    eng = Groth16("bls12_381")
    cs = toy_circuit(eng.ctx.r)
    pk, vk = eng.setup(cs, rng, engine="device")
    assert isinstance(pk.a_query, dict)
    proof = eng.prove(pk, cs, rng)
    inputs = cs.public_inputs()
    assert eng.verify(vk, inputs, proof)
    bad = list(inputs)
    bad[0] = (bad[0] + 1) % eng.ctx.r
    assert not eng.verify(vk, bad, proof)
