"""Payment-layer crypto: keccak, AES, ECDSA, adaptor signatures, wallet."""

import random

from contangle_zkcp_tpu.zkcp import secp
from contangle_zkcp_tpu.zkcp.aes import aes128_ctr
from contangle_zkcp_tpu.zkcp.ethereum import (
    LegacyTx,
    MockChain,
    address_from_pk,
    derive_v_by_trial,
)
from contangle_zkcp_tpu.zkcp.keccak import keccak256
from contangle_zkcp_tpu.zkcp.wallet import LocalWallet, read_keystore, write_keystore


def test_keccak256_vectors():
    assert (
        keccak256(b"").hex()
        == "c5d2460186f7233c927e7db2dcc703c0e500b653ca82273b7bfad8045d85a470"
    )
    assert (
        keccak256(b"abc").hex()
        == "4e03657aea45a94fc7d47ba826c8d667c0d1e6e33a64a036ec44f58fa12d6c45"
    )
    # multi-block message (> 136-byte rate)
    assert (
        keccak256(b"a" * 200).hex()
        == keccak256(b"a" * 200).hex()
    )


def test_aes128_known_vector():
    # FIPS-197 example via CTR with counter == plaintext block trick:
    # encrypt a single block by using iv = block and empty-xor data
    from contangle_zkcp_tpu.zkcp.aes import _expand_key, _encrypt_block

    key = bytes.fromhex("000102030405060708090a0b0c0d0e0f")
    pt = bytes.fromhex("00112233445566778899aabbccddeeff")
    ct = _encrypt_block(pt, _expand_key(key))
    assert ct.hex() == "69c4e0d86a7b0430d8cdb78070b4c55a"
    # CTR roundtrip
    iv = bytes(range(16))
    data = bytes(range(100))
    enc = aes128_ctr(key, iv, data)
    assert aes128_ctr(key, iv, enc) == data


def test_ecdsa_sign_verify_recover():
    rng = random.Random(51)
    sk, pk = secp.keypair_gen(rng)
    msg = keccak256(b"hello")
    sig = secp.sign(sk, msg)
    assert secp.verify(pk, msg, sig)
    assert not secp.verify(pk, keccak256(b"other"), sig)
    # public key recovery finds the signer
    recovered = [secp.recover_pubkey(msg, sig, i) for i in (0, 1)]
    assert pk in recovered


def test_adaptor_signature_flow():
    rng = random.Random(52)
    signer_sk, signer_pk = secp.keypair_gen(rng)  # buyer wallet
    y, Y = secp.keypair_gen(rng)  # seller one-time key
    msg = keccak256(b"payment tx")
    es = secp.encrypted_sign(signer_sk, Y, msg)
    assert secp.verify_encrypted_signature(signer_pk, Y, msg, es)
    # tampered pre-signature rejected
    bad = secp.EncryptedSignature(es.R, es.R_hat, (es.s_hat + 1) % secp.N, es.proof)
    assert not secp.verify_encrypted_signature(signer_pk, Y, msg, bad)
    # decrypting yields a valid ECDSA signature
    sig = secp.decrypt_signature(y, es)
    assert secp.verify(signer_pk, msg, sig)
    # the broadcast signature reveals y
    rec = secp.recover_decryption_key(Y, sig, es)
    assert rec == y
    # serialization roundtrip
    es2 = secp.EncryptedSignature.from_hex(es.to_hex())
    assert es2 == es


def test_wallet_keystore_roundtrip(tmp_path):
    w = LocalWallet.from_hex(
        "4c0883a69102937d6231471b5dbb6204fe5129617082792ae468d01a3f362318"
    )
    path = write_keystore(w.sec_key(), tmp_path, "ks.json", b"pw123")
    sk = read_keystore(path, b"pw123")
    assert sk == w.sec_key()
    try:
        read_keystore(path, b"wrong")
        assert False, "wrong password accepted"
    except Exception:
        pass
    # known Ethereum address for this famous test key
    assert w.address().hex() == "2c7536e3605d9c16a7a3d7b1898e529396a65c23"


def test_wallet_from_bip39_golden():
    """Mnemonic recovery at m/44'/60'/0'/0/0, the reference's
    keypair_from_bip39 (/root/reference/lib/src/utils.rs:38-50, ethers
    MnemonicBuilder default path).  Golden vector: the universally-known
    hardhat/anvil dev mnemonic -> account #0 key and address."""
    from contangle_zkcp_tpu.zkcp.wallet import keypair_from_bip39

    phrase = "test test test test test test test test test test test junk"
    sk, pk = keypair_from_bip39(phrase)
    assert (
        hex(sk)
        == "0xac0974bec39a17e36ba4a6b4d238ff944bacb478cbed5efcae784d7bf4f2ff80"
    )
    w = LocalWallet.from_bip39(phrase)
    assert w.address().hex() == "f39fd6e51aad88f6f4ce6ab8827279cfffb92266"
    assert w.pk == pk
    # shape validation: wrong word count rejected
    try:
        keypair_from_bip39("only three words")
        assert False, "bad word count accepted"
    except Exception:
        pass


def test_eip155_recid_and_mock_chain():
    rng = random.Random(53)
    w = LocalWallet.new(rng)
    chain = MockChain()
    to = bytes(range(20))
    tx, sighash = chain.compose_tx(w.address(), to, 1.5)
    sig = secp.sign(w.sec_key(), sighash)
    v = derive_v_by_trial(tx, sig)
    assert v in (35 + 2 * chain.chain_id, 36 + 2 * chain.chain_id)
    tx_hash = chain.sent_signed(tx, sig)
    got = chain.get_signature(tx_hash)
    assert (got.r, got.s) == (sig.r, sig.s)
    assert chain.balances[to] == int(1.5 * 10**18)
