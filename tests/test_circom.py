"""circom pipeline: r1cs format, dummy circuit, composition, BN254 Groth16."""

import random

import pytest

from contangle_zkcp_tpu.circomx import (
    CircomBuilder,
    CircomCircuit,
    CircomConfig,
    compile_dummy,
    dummy_signal_map,
    read_r1cs,
    write_r1cs,
)
from contangle_zkcp_tpu.fields import instances as fi
from contangle_zkcp_tpu.groth16 import Groth16
from contangle_zkcp_tpu.r1cs.builder import ConstraintSystem


def test_r1cs_binary_roundtrip():
    r1 = compile_dummy(8)
    data = write_r1cs(r1)
    back = read_r1cs(data)
    assert back.prime == r1.prime
    assert back.n_wires == r1.n_wires
    assert back.n_prv_in == r1.n_prv_in
    assert back.constraints == r1.constraints


def test_dummy_witness_solving_and_satisfaction():
    n = 8
    r1 = compile_dummy(n)
    cfg = CircomConfig(r1cs=r1, signal_map=dummy_signal_map(n), sanity_check=True)
    b = CircomBuilder(cfg)
    b.push_variable("plaintext", [3, 7, 9])
    b.push_input("something", 3)
    b.push_input("challenge", 9)
    w = b.solve_witness()
    assert w[0] == 1 and w[1] == 3
    # violating witness trips the sanity check
    b2 = CircomBuilder(cfg)
    b2.push_variable("plaintext", [4])
    b2.push_input("something", 3)
    b2.push_input("challenge", 9)
    with pytest.raises(Exception):
        b2.solve_witness()


def test_constraint_propagation_solver():
    # drop the 'challenge' assignment: solvable from something^2
    n = 4
    r1 = compile_dummy(n)
    cfg = CircomConfig(r1cs=r1, signal_map=dummy_signal_map(n), sanity_check=True)
    b = CircomBuilder(cfg)
    b.push_variable("plaintext", [5, 0, 0, 0])
    b.push_input("something", 5)
    w = b.solve_witness()
    assert w[2 + n] == 25  # challenge wire solved


def test_dummy_groth16_over_bn254():
    """BASELINE config #1: circom dummy Groth16 prove+verify over BN254."""
    n = 8
    r1 = compile_dummy(n, prime=fi.BN254_R)
    cfg = CircomConfig(r1cs=r1, signal_map=dummy_signal_map(n), sanity_check=True)
    b = CircomBuilder(cfg)
    pt = [6, 1, 2, 3]
    b.push_variable("plaintext", pt)
    b.push_input("something", 6)
    b.push_input("challenge", 36)
    w = b.solve_witness()
    circ = CircomCircuit(cfg, w)
    cs = ConstraintSystem(p=fi.BN254_R)
    var = circ.allocate(cs)
    circ.enforce(cs, var)
    assert cs.is_satisfied()
    eng = Groth16("bn254")
    rng = random.Random(81)
    pk, vk = eng.setup(cs, rng)
    proof = eng.prove(pk, cs, rng)
    assert eng.verify(vk, cs.public_inputs(), proof)


def test_property_verifier_mock_composed(tmp_path):
    from contangle_zkcp_tpu.zkcp.config import CircomParams
    from contangle_zkcp_tpu.zkcp.property import ZkPropertyVerifier

    n = 8
    pv = ZkPropertyVerifier(
        tmp_path, CircomParams(), n, backend="mock"
    )
    pv.compile()
    from contangle_zkcp_tpu.circuits import elgamal
    from contangle_zkcp_tpu.curves import instances as ci

    params = elgamal.ElGamalParams(curve=ci.JUBJUB, n=n)
    sk, pk = elgamal.keygen(params, random.Random(82))
    msg = bytes([5, 1, 2, 3])
    args = {"something": 5, "challenge": 25}
    cipher_bytes, pop = pv.assess_property_and_encrypt(msg, sk, pk, args)
    assert pv.verify_proof(pop, cipher_bytes)


def test_property_verifier_real_groth16_composed(tmp_path):
    """The composed circom+encryption statement with the REAL Groth16
    backend (VERDICT r1: previously mock-only) — compile, prove, verify,
    and reject a tampered ciphertext."""
    from contangle_zkcp_tpu.zkcp.config import CircomParams
    from contangle_zkcp_tpu.zkcp.property import ZkPropertyVerifier

    n = 4
    pv = ZkPropertyVerifier(tmp_path, CircomParams(), n, backend="groth16")
    pv.compile()
    from contangle_zkcp_tpu.circuits import elgamal
    from contangle_zkcp_tpu.curves import instances as ci

    params = elgamal.ElGamalParams(curve=ci.JUBJUB, n=n)
    sk, pk = elgamal.keygen(params, random.Random(93))
    msg = bytes([5, 1, 2])
    args = {"something": 5, "challenge": 25}
    cipher_bytes, pop = pv.assess_property_and_encrypt(msg, sk, pk, args)
    assert pv.verify_proof(pop, cipher_bytes)
    assert not pv.verify_proof(pop, cipher_bytes[:-1] + bytes([cipher_bytes[-1] ^ 1]))
