"""Conformance: ark_std::test_rng / ChaCha / UniformRand replay vectors.

Cross-validated against the reference where goldens exist; other vectors
are pinned replays of the reference's deterministic test transcripts
(the committed code paths at /root/reference/circuits-ark/src/
encryption.rs:352-426, utils.rs:145-161) so any regression in the RNG,
sampling, curve or serialization stack trips here.
"""

import struct

from contangle_zkcp_tpu.circuits import elgamal
from contangle_zkcp_tpu.conformance.ark_rng import TEST_RNG_SEED, fp_rand, test_rng
from contangle_zkcp_tpu.conformance.chacha import chacha_block, chacha20
from contangle_zkcp_tpu.curves import instances as ci
from contangle_zkcp_tpu.fields import instances as fi
from contangle_zkcp_tpu.utils.serialize import edwards_to_bytes, fp_from_random_bytes

# The one true external golden: the reference's pinned Alice secret key
# (/root/reference/circuits-ark/src/utils.rs:114) — byte-identical to the
# FIRST Jubjub-Fr draw from ark_std::test_rng().  This transitively
# validates: the ark-std 0.3 seed, ChaCha12 (rand 0.8 StdRng) block
# function and word order, BigInteger256 limb sampling order, the
# REPR_SHAVE_BITS masking, and the rejection loop.
ALICE_SK = "be3f1cca6354c294cf64c098dea22d04009e94b7dbfb6bf46e783b7e4fd4dd0a"


def test_chacha20_rfc7539_block():
    key = list(struct.unpack("<8I", bytes(range(32))))
    nonce = struct.unpack("<3I", bytes.fromhex("000000090000004a00000000"))
    out = chacha_block(key, (1,), nonce, 20)
    buf = b"".join(struct.pack("<I", w) for w in out)
    assert buf.hex().startswith("10f1e7e4d13b5915500fdd1fa32071c4")


def test_test_rng_first_words():
    rng = test_rng()
    assert [hex(rng.next_u64()) for _ in range(4)] == [
        "0x94c25463ca1c3fbe",
        "0x42da2de98c064cf",
        "0xf46bfbdbb7949e00",
        "0xaaddd44f7e3b786e",
    ]


def test_alice_sk_replay_matches_reference_golden():
    rng = test_rng()
    sk = fp_rand(rng, fi.JUBJUB_FR)
    assert sk.to_bytes(32, "little").hex() == ALICE_SK


def test_fill_bytes_matches_sk_raw_stream():
    """fill_bytes(32) from test_rng is the raw (pre-shave) byte stream of
    the first draw — replays utils.rs:146-148; last byte 0xaa shaves to
    the golden 0x0a."""
    rng = test_rng()
    raw = rng.fill_bytes(32)
    assert raw.hex() == ALICE_SK[:-2] + "aa"


def test_field_rand_first_draws():
    """First UniformRand draw per field (pinned replays; shave bits 4/1/3)."""
    for p, want in [
        (
            fi.JUBJUB_FR,
            0x0ADDD44F7E3B786EF46BFBDBB7949E00042DA2DE98C064CF94C25463CA1C3FBE,
        ),
        (
            fi.BLS12_381_R,
            0x2ADDD44F7E3B786EF46BFBDBB7949E00042DA2DE98C064CF94C25463CA1C3FBE,
        ),
        (
            fi.BLS12_381_P,
            0x33EDC24198C03528255C7E9F7A37C04AADDD44F7E3B786EF46BFBDBB7949E00042DA2DE98C064CF94C25463CA1C3FBE,
        ),
    ]:
        assert fp_rand(test_rng(), p) == want


def test_ciphertext_decode_c2_replay():
    """Replay of utils.rs `test_ciphertext_decode`: 32 filled bytes ->
    from_random_bytes (shave-masked) -> Fq element."""
    rng = test_rng()
    v = fp_from_random_bytes(rng.fill_bytes(32), fi.BLS12_381_R)
    assert v == 0x2ADDD44F7E3B786EF46BFBDBB7949E00042DA2DE98C064CF94C25463CA1C3FBE


def test_elgamal_encryption_transcript_replay():
    """Replay of encryption.rs `test_elgamal_encryption` (n=1): the exact
    rng transcript — keygen (sk draw), Randomness::rand (r draw) — through
    our curve, Poseidon sponge and serialization.  Pinned end-to-end."""
    rng = test_rng()
    msg = fp_from_random_bytes(bytes([1, 2, 3]), fi.BLS12_381_R)
    assert msg == 0x30201
    sk = fp_rand(rng, fi.JUBJUB_FR)
    C = ci.JUBJUB
    pk = C.mul(sk, C.generator)
    r = fp_rand(rng, fi.JUBJUB_FR)
    assert (
        r == 0x087B871A42CC7E352F862DB864633FA7433EDC24198C03528255C7E9F7A37C04
    )
    params = elgamal.ElGamalParams(curve=C, n=1)
    c1, c2 = elgamal.encrypt(params, pk, [msg], r)
    assert (
        edwards_to_bytes(pk, C).hex()
        == "1331b63a3f85f69c5169c003f4764f87f4ce792820252337ebbb106da2b56496"
    )
    assert (
        edwards_to_bytes(c1, C).hex()
        == "533ab6608e0fc18737e51d1512af0a355374e7d857b7c94df3261a3ee6e663ce"
    )
    assert c2 == [
        0x6B188B158FB7820CE6F1879709B1A8FC19088B92B922F40947532E67741CDEC6
    ]
    assert elgamal.decrypt(params, sk, (c1, c2)) == [msg]
