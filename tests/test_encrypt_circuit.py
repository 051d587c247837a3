"""ElGamal native roundtrip + Proof-of-Encryption circuit satisfiability."""

import random

from contangle_zkcp_tpu.circuits import elgamal
from contangle_zkcp_tpu.circuits.encrypt_circuit import EncryptCircuit
from contangle_zkcp_tpu.curves import instances as ci


def _params(n=1):
    return elgamal.ElGamalParams(curve=ci.JUBJUB, n=n)


def test_elgamal_roundtrip():
    # mirrors the reference's test_elgamal_encryption (n=1, bytes [1,2,3])
    rng = random.Random(31)
    params = _params(1)
    sk, pk = elgamal.keygen(params, rng)
    msg = [197121]  # from_random_bytes([1,2,3]) = 1 + 2*256 + 3*65536
    r = elgamal.random_scalar(params, rng)
    cipher = elgamal.encrypt(params, pk, msg, r)
    assert elgamal.decrypt(params, sk, cipher) == msg
    assert elgamal.decrypt_at(params, sk, cipher, 0) == msg[0]


def test_elgamal_multi_block():
    rng = random.Random(32)
    params = _params(8)
    sk, pk = elgamal.keygen(params, rng)
    msg = [rng.randrange(params.curve.p) for _ in range(8)]
    r = elgamal.random_scalar(params, rng)
    cipher = elgamal.encrypt(params, pk, msg, r)
    assert elgamal.decrypt(params, sk, cipher) == msg


def test_encrypt_circuit_satisfied():
    rng = random.Random(33)
    params = _params(2)
    sk, pk = elgamal.keygen(params, rng)
    msg = [5, 7]
    r = elgamal.random_scalar(params, rng)
    cipher = elgamal.encrypt(params, pk, msg, r)
    circ = EncryptCircuit(params)
    cs = circ.synthesize(pk, msg, r, cipher)
    assert cs.is_satisfied()
    # public inputs are [c1.x, c1.y, c2...]
    assert cs.public_inputs() == elgamal.public_inputs(params, cipher)


def test_encrypt_circuit_rejects_tampering():
    rng = random.Random(34)
    params = _params(1)
    sk, pk = elgamal.keygen(params, rng)
    msg = [42]
    r = elgamal.random_scalar(params, rng)
    c1, c2 = elgamal.encrypt(params, pk, msg, r)
    bad = (c1, [(c2[0] + 1) % params.curve.p])
    circ = EncryptCircuit(params)
    cs = circ.synthesize(pk, msg, r, bad)
    assert not cs.is_satisfied()


def test_encrypt_circuit_padding_quirk():
    # zero-valued ciphertext blocks are excused from the equality check
    # (preserved reference behavior, encryption.rs:258-260)
    rng = random.Random(35)
    params = _params(4)
    sk, pk = elgamal.keygen(params, rng)
    msg = [1, 2]  # only 2 of 4 blocks
    r = elgamal.random_scalar(params, rng)
    cipher = elgamal.encrypt(params, pk, msg, r)
    circ = EncryptCircuit(params)
    cs = circ.synthesize(pk, msg, r, cipher)
    assert cs.is_satisfied()
