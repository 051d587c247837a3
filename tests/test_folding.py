"""Nova-style folding of PoE R1CS instances (recursion groundwork).

The reference documents recursive aggregation but never implements it
(docs/protocol.md:57); this verifies our accumulation primitive: many
satisfied EncryptCircuit instances fold into ONE relaxed instance whose
single check certifies them all.
"""

import random

import pytest

from contangle_zkcp_tpu.circuits import elgamal
from contangle_zkcp_tpu.circuits.encrypt_circuit import EncryptCircuit
from contangle_zkcp_tpu.curves import instances as ci
from contangle_zkcp_tpu.groth16.folding import FoldingScheme


def _mini_poe_cs(n, seed):
    """PoE-shaped structure at unit-test scale: per-block ElGamal c2
    equations + a Poseidon KDF digest, WITHOUT the in-circuit scalar-mul
    gadgets (those make ~6k constraints whose Pedersen bases dominate
    unit-test time; the full EncryptCircuit structure folds identically
    and is exercised by benchmarks/drive_scale_proof.py on the TPU)."""
    from contangle_zkcp_tpu.r1cs.builder import ConstraintSystem
    from contangle_zkcp_tpu.r1cs.gadgets import Gadgets

    rng = random.Random(seed)
    params = elgamal.ElGamalParams(curve=ci.JUBJUB, n=n)
    sk, pk = elgamal.keygen(params, rng)
    r = elgamal.random_scalar(params, rng)
    msg = [rng.randrange(256) for _ in range(n)]
    c1, c2 = elgamal.encrypt(params, pk, msg, r)
    dh = elgamal.shared_digest(params, params.curve.mul(r, pk))
    cs = ConstraintSystem(p=params.curve.p)
    g = Gadgets(cs)
    dh_var = g.witness(dh)
    for i in range(n):
        m = g.witness(msg[i])
        c2v = g.input(c2[i])
        g.enforce_equal(dh_var + m, c2v)
    # one square chain so the structure has nonlinear rows
    sq = g.mul(dh_var, dh_var)
    g.enforce_equal(g.mul(sq, dh_var), g.witness(pow(dh, 3, cs.p)))
    assert cs.is_satisfied()
    return cs


@pytest.fixture(scope="module")
def setup():
    """One PoE-shaped structure + three satisfied instances + shared
    scheme (bases derive once per module)."""
    css = [_mini_poe_cs(4, s) for s in (11, 22, 33)]
    scheme = FoldingScheme(css[0])
    lifted = [scheme.instance_from_cs(cs) for cs in css]
    return scheme, lifted


def test_fold_two_poe_instances(setup):
    scheme, lifted = setup
    (i1, w1), (i2, w2) = lifted[0], lifted[1]
    assert scheme.check(i1, w1) and scheme.check(i2, w2)
    acc_i, acc_w = scheme.fold(i1, w1, i2, w2)
    assert acc_i.u not in (0, 1)  # genuinely relaxed
    assert scheme.check(acc_i, acc_w)


def test_fold_chain_of_three(setup):
    scheme, lifted = setup
    acc_i, acc_w = lifted[0]
    for i2, w2 in lifted[1:]:
        acc_i, acc_w = scheme.fold(acc_i, acc_w, i2, w2)
    assert scheme.check(acc_i, acc_w)


def test_fold_rejects_bad_witness(setup):
    scheme, lifted = setup
    (i1, w1), (i2, w2) = lifted[0], lifted[1]
    acc_i, acc_w = scheme.fold(i1, w1, i2, w2)
    acc_w = type(acc_w)(w=list(acc_w.w), e=list(acc_w.e))
    acc_w.w[3] = (acc_w.w[3] + 1) % scheme.p
    assert not scheme.check(acc_i, acc_w)
