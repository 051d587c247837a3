"""Batched Groth16 verification."""

import random

from contangle_zkcp_tpu.groth16 import Groth16, Proof
from contangle_zkcp_tpu.groth16.aggregate import batch_verify
from tests.test_groth16 import toy_circuit


def test_batch_verify_accepts_and_rejects():
    eng = Groth16("bls12_381")
    p = eng.ctx.r
    rng = random.Random(111)
    cs = toy_circuit(p)
    pk, vk = eng.setup(cs, rng)
    statements = []
    for i in range(3):
        csx = toy_circuit(p, x=3 + i, y=5 + i)
        proof = eng.prove(pk, csx, rng)
        statements.append((csx.public_inputs(), proof))
    assert batch_verify(vk, statements, rng=rng)
    # one bad proof poisons the batch
    g1 = eng.ctx.g1
    inputs, proof = statements[1]
    bad = Proof(a=g1.add(proof.a, g1.generator), b=proof.b, c=proof.c)
    statements[1] = (inputs, bad)
    assert not batch_verify(vk, statements, rng=rng)
    # empty batch trivially true
    assert batch_verify(vk, [], rng=rng)
