"""Conformance: remaining reference-derived golden vectors.

Each test replays a deterministic code path committed in the reference
(cited file:line) and checks it against either an external golden
constant from the reference source, an independent in-test
reimplementation, or a pinned transcript of the replayed bytes.
"""

from contangle_zkcp_tpu.circuits import elgamal
from contangle_zkcp_tpu.conformance.ark_rng import fp_rand, test_rng
from contangle_zkcp_tpu.curves import instances as ci
from contangle_zkcp_tpu.fields import instances as fi
from contangle_zkcp_tpu.utils.serialize import (
    edwards_to_bytes,
    fp_from_random_bytes,
    fp_to_bytes,
)
from contangle_zkcp_tpu.zkcp import secp

# /root/reference/circuits-ark/src/utils.rs:114-115 — printed by the
# reference's deterministic `test_elgamal_keygen` (encryption.rs:416-426).
ALICE_SK = "be3f1cca6354c294cf64c098dea22d04009e94b7dbfb6bf46e783b7e4fd4dd0a"
ALICE_PK = "7a9b475fcd963e7a8210b8863e8d5b8ca36902860ce10dd5b951932b2bba44bb"


def test_alice_keypair_goldens():
    """The reference's own tests (utils.rs:117-127) assert exactly two
    properties of these constants: the sk parses as Jubjub Fr and the pk
    decodes as a curve point — it never checks pk == sk*G, and indeed
    sk*prime_subgroup_generator does NOT reproduce ALICE_PK under any
    serialization convention (the constants predate the committed keygen
    path; verified exhaustively).  We additionally pin that the sk is
    byte-identical to the FIRST test_rng() Fr draw (how the reference's
    test_elgamal_keygen produces it) and that pk decode/encode
    roundtrips bit-exactly."""
    rng = test_rng()
    sk = fp_rand(rng, fi.JUBJUB_FR)
    assert sk.to_bytes(32, "little").hex() == ALICE_SK
    C = ci.JUBJUB
    from contangle_zkcp_tpu.utils.serialize import edwards_from_bytes

    P = edwards_from_bytes(bytes.fromhex(ALICE_PK), C)
    assert C.is_on_curve(P)
    # The golden pk is NOT in the prime-order subgroup (order*P is a
    # 2-torsion point; 8*order*P is the identity) — more proof it cannot
    # be sk*prime_subgroup_generator.  ark 0.3 TE deserialization accepts
    # it anyway (no subgroup check — the reference's decode test passes),
    # and so must ours:
    assert C.mul(8 * C.order, P) == (0, 1)
    assert C.mul(C.order, P) != (0, 1)
    assert edwards_to_bytes(P, C).hex() == ALICE_PK


# /root/reference/lib/src/utils.rs:125-132 — secp256kfun Scalar::from_str
# (big-endian hex) then pk = sk*G, printed as 33-byte SEC1 compressed.
KEYPAIR_HEX = "ea734cef7d66a4a51df3fe20f4d6a21f9439cf325e64342234c67cc04db1050a"


def _indep_secp_mul(k: int):
    """Independent textbook affine double-and-add on raw ints (no shared
    code with zkcp.secp's curve engine)."""
    p = 2**256 - 2**32 - 977
    G = (
        0x79BE667EF9DCBBAC55A06295CE870B07029BFCDB2DCE28D959F2815B16F81798,
        0x483ADA7726A3C4655DA4FBFC0E1108A8FD17B448A68554199C47D08FFB10D4B8,
    )

    def add(A, B):
        if A is None:
            return B
        if B is None:
            return A
        (x1, y1), (x2, y2) = A, B
        if x1 == x2 and (y1 + y2) % p == 0:
            return None
        if A == B:
            lam = 3 * x1 * x1 * pow(2 * y1, -1, p) % p
        else:
            lam = (y2 - y1) * pow(x2 - x1, -1, p) % p
        x3 = (lam * lam - x1 - x2) % p
        return (x3, (lam * (x1 - x3) - y1) % p)

    acc = None
    for bit in reversed(range(k.bit_length())):
        acc = add(acc, acc)
        if (k >> bit) & 1:
            acc = add(acc, G)
    return acc


def test_keypair_from_hex_replay():
    sk, pk = secp.keypair_from_hex(KEYPAIR_HEX)
    # Scalar::to_bytes is big-endian: roundtrip gives back the hex
    assert secp.scalar_to_bytes(sk).hex() == KEYPAIR_HEX
    # cross-check the group math against the independent implementation
    assert pk == _indep_secp_mul(sk)
    # pinned transcript of Point::to_bytes (SEC1 compressed)
    assert secp.point_to_bytes(pk).hex() == (
        "029152eaa25a744137f18f6ec85e87acd85f91dbb2170edf32b8a9e5eee16e6a17"
    )


def test_secp_generator_golden():
    """k=1 compressed generator is the universally pinned SEC2 constant."""
    assert secp.point_to_bytes(secp.SECP256K1.generator).hex() == (
        "0279be667ef9dcbbac55a06295ce870b07029bfcdb2dce28d959f2815b16f81798"
    )


def test_ciphertext_serde_replay():
    """Replay utils.rs:150-161 `test_ciphertext_decode`: ciphertext =
    (G, vec![c2]) with c2 = Fq::from_random_bytes(test_rng 32 bytes);
    ark_to_bytes = Edwards compression ++ u64 LE vec length ++ 32-byte LE
    field element; pinned transcript + roundtrip."""
    rng = test_rng()
    c2 = fp_from_random_bytes(rng.fill_bytes(32), fi.BLS12_381_R)
    C = ci.JUBJUB
    blob = (
        edwards_to_bytes(C.generator, C)
        + (1).to_bytes(8, "little")
        + fp_to_bytes(c2, fi.BLS12_381_R)
    )
    assert blob.hex() == (
        # generator compression (pinned; golden-validated encoder per
        # test_alice_keypair_full_replay)
        "aa92d2590e873fccd7fe20c25cba263ec3c066c8782e1393171aabddf13c521d"
        + "0100000000000000"
        + "be3f1cca6354c294cf64c098dea22d04009e94b7dbfb6bf46e783b7e4fd4dd2a"
    )


def test_plaintext_chunks_replay():
    """Replay utils.rs:129-147: bytes_to_plaintext_chunks roundtrips for
    [1,2,3] and [1; 64] (the reference's two vectors)."""
    from contangle_zkcp_tpu.utils.chunks import bytes_to_chunks, chunks_to_bytes

    r = fi.BLS12_381_R
    for data in (bytes([1, 2, 3]), bytes([1] * 64)):
        chunks = bytes_to_chunks(data, r)
        assert chunks_to_bytes(chunks, r) == data


def test_elgamal_keygen_transcript_pk_on_curve():
    """Replay encryption.rs:416-426 keygen path shape: sk/pk pair from
    the deterministic rng lands on the curve and decrypts what it
    encrypts (n=1, second rng draw for randomness)."""
    rng = test_rng()
    C = ci.JUBJUB
    sk = fp_rand(rng, fi.JUBJUB_FR)
    pk = C.mul(sk, C.generator)
    r = fp_rand(rng, fi.JUBJUB_FR)
    params = elgamal.ElGamalParams(curve=C, n=1)
    msg = [0x1234]
    ct = elgamal.encrypt(params, pk, msg, r)
    assert elgamal.decrypt(params, sk, ct) == msg
